"""ENet converter: positional shape-matched conversion round-trip."""
import numpy as np
import jax

from spacap3d_tpu.models.enet import init_enet_encoder
from spacap3d_tpu.utils.convert_enet import convert_enet_state_dict


def test_enet_positional_conversion(rng):
    params, state = init_enet_encoder(jax.random.PRNGKey(0))

    # synthesize a torch-layout state dict from our own tree, in order:
    # conv kernels transposed to (out, in, kh, kw), others as-is
    sd = {}
    i = 0

    def emit(tree):
        global_i = None
        from spacap3d_tpu.utils.convert_enet import _flatten_ordered
        for path, leaf in _flatten_ordered(tree):
            nonlocal i
            leaf = np.asarray(leaf)
            if path[-1] == "kernel" and leaf.ndim == 4:
                sd[f"t{i:04d}.weight"] = rng.randn(
                    leaf.shape[3], leaf.shape[2], leaf.shape[0], leaf.shape[1]
                ).astype(np.float32)
            else:
                sd[f"t{i:04d}.x"] = np.asarray(rng.randn(*leaf.shape), np.float32)
            i += 1

    emit(params)
    emit(state)

    p2, s2, n = convert_enet_state_dict(sd, params, state)
    total = len(jax.tree_util.tree_leaves(params)) + len(
        jax.tree_util.tree_leaves(state)
    )
    assert n == total  # every leaf received a torch tensor
    # spot-check a conv transpose round-trip
    w = sd["t0000.weight"]
    got = np.asarray(p2["initial_conv"]["kernel"])
    np.testing.assert_array_equal(got, np.transpose(w, (2, 3, 1, 0)))
