from d2r_tpu.ops.attention import dot_product_attention, padding_key_bias  # noqa: F401
from d2r_tpu.ops.losses import cross_entropy_loss, js_div, path_consistency_loss  # noqa: F401
