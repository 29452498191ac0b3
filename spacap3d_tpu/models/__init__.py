from spacap3d_tpu.models.spacap import apply_spacap, init_spacap  # noqa: F401
