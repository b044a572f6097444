from pointcontrast_tpu.losses.contrastive import (
    point_info_nce_loss,
    hardest_contrastive_loss,
)
from pointcontrast_tpu.losses.semseg import (
    cross_entropy_ignore,
    fast_hist,
    per_class_iu,
)
