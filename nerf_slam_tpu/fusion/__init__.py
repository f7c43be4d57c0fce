from .hashgrid import HashGridConfig  # noqa: F401
from .ngp import NGPConfig, init_ngp, render_rays  # noqa: F401
from .nerf_fusion import NerfFusion, NerfFusionConfig  # noqa: F401
