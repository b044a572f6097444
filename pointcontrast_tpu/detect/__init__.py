"""3D object detection application (VoteNet on ScanNet / SUN RGB-D).

Mirrors the reference downstream/votenet_det_new app (SURVEY.md sections
2.4, 2.6): the vendored PointNet++ CUDA extension becomes jitted XLA ops
(``detect.ops``), the VoteNet heads become flax modules, the loss is a
static-shape Chamfer/CE composite, and AP/NMS evaluation stays host-side
numpy exactly like the reference.
"""

from pointcontrast_tpu.detect import ops
from pointcontrast_tpu.detect.ops import (
    furthest_point_sample,
    ball_query,
    gather_points,
    group_points,
    three_nn,
    three_interpolate,
)
