"""Dataset factory (reference datasets/data_module.py + slam_demo wiring)."""
from __future__ import annotations


def build_dataset(dataset_name: str, dataset_dir: str = None, **kw):
    if dataset_name == "synthetic" or dataset_dir is None:
        from .synthetic import SyntheticDataset, SyntheticConfig
        cfg_kw = {k: v for k, v in kw.items()
                  if k in SyntheticConfig.__dataclass_fields__}
        return SyntheticDataset(SyntheticConfig(**cfg_kw))
    loader_kw = {k: v for k, v in kw.items()
                 if k in ("initial_k", "final_k", "img_stride", "buffer")}
    if dataset_name == "nerf":
        from .nerf_dataset import NeRFDataset
        return NeRFDataset(dataset_dir, **loader_kw)
    if dataset_name == "replica":
        from .replica_dataset import ReplicaDataset
        return ReplicaDataset(dataset_dir, **loader_kw)
    if dataset_name == "tum":
        from .tum_dataset import TumDataset
        return TumDataset(dataset_dir, **loader_kw)
    if dataset_name == "euroc":
        from .euroc_dataset import EurocDataset
        if "target_hw" in kw:
            loader_kw["target_hw"] = kw["target_hw"]
        elif "height" in kw and "width" in kw:
            loader_kw["target_hw"] = (kw["height"], kw["width"])
        return EurocDataset(dataset_dir, stereo=kw.get("stereo", False),
                            **loader_kw)
    if dataset_name == "realsense":
        from .realsense_dataset import RealSenseDataset
        return RealSenseDataset(buffer=kw.get("buffer", 512))
    raise ValueError(f"unknown dataset '{dataset_name}'")
