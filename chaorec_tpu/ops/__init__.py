from chaorec_tpu.ops.losses import (  # noqa: F401
    bpr_loss,
    emb_l2_reg,
    info_nce,
    masked_mean,
)
from chaorec_tpu.ops.init import xavier_normal, xavier_uniform, normal_init  # noqa: F401
