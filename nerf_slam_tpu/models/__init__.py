from .layers import BasicEncoder, ResidualBlock, instance_norm  # noqa: F401
from .update import ConvGRU, GraphAgg, UpdateModule, DroidNet  # noqa: F401
from . import weights  # noqa: F401
