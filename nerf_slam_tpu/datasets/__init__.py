from .synthetic import SyntheticDataset, SyntheticConfig  # noqa: F401
