from .dataset import CalibDataset, batch_samples  # noqa: F401
