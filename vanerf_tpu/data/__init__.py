from .synthetic import SyntheticDataset, make_synthetic_batch  # noqa: F401
