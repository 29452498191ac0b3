"""TPU-native geometry op layer.

JAX/XLA/Pallas replacements for the reference PointNet++ CUDA extension
(lib/pointnet2/_ext_src/, 9 ops) plus the dense chamfer / box geometry
utilities. All ops are fixed-shape and jit-compatible; index ops are
non-differentiable, gathers autodiff to the reference's scatter-add
gradients.
"""

from spacap3d_tpu.ops.ball_query import ball_query  # noqa: F401
from spacap3d_tpu.ops.boxes import (  # noqa: F401
    box3d_iou_batch,
    box3d_minmax,
    get_3d_box_batch,
)
from spacap3d_tpu.ops.fps import (  # noqa: F401
    furthest_point_sample,
    furthest_point_sample_xla,
)
from spacap3d_tpu.ops.fps_pallas import (  # noqa: F401
    furthest_point_sample_pallas,
)
from spacap3d_tpu.ops.grouping import (  # noqa: F401
    gather_points,
    group_and_localize,
    group_points,
)
from spacap3d_tpu.ops.interpolate import three_interpolate, three_nn  # noqa: F401
from spacap3d_tpu.ops.nn_distance import huber_loss, nn_distance  # noqa: F401
