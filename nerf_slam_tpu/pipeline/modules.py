"""Concrete pipeline stages: data source, SLAM, fusion, eval sink.

Equivalents of the reference's DataModule / SlamModule / FusionModule
wrappers (datasets/data_module.py, slam/slam_module.py,
fusion/fusion_module.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .module import PipelineModule


class DataModule(PipelineModule):
    """Source stage: iterates a dataset (reference datasets/data_module.py)."""

    def __init__(self, dataset, parallel_run: bool = True,
                 img_stride: int = 1):
        super().__init__("data", parallel_run)
        self.dataset = dataset
        self.img_stride = img_stride
        self._idx = 0
        self._out_k = 0

    def spin_once(self, _):
        n = len(self.dataset)
        if self._idx >= n:
            self.shutdown_module()
            return None
        pkt = self.dataset[self._idx]
        pkt = dict(pkt)
        pkt["k"] = self._out_k
        last_after_stride = self._idx + self.img_stride >= n
        pkt["is_last_frame"] = bool(pkt.get("is_last_frame", False)
                                    or last_after_stride)
        self._idx += self.img_stride
        self._out_k += 1
        if pkt["is_last_frame"]:
            self.shutdown_module()
        return pkt


class SlamModule(PipelineModule):
    """Tracking stage wrapping RaftVisualFrontend or a SLAM object
    (VioSLAM) (reference slam/slam_module.py)."""

    def __init__(self, frontend, parallel_run: bool = True):
        super().__init__("slam", parallel_run)
        self.frontend = frontend
        from ..slam.meta_slam import SLAM
        self._is_slam = isinstance(frontend, SLAM)

    def spin_once(self, packet):
        from ..utils.runtime import DEVICE_LOCK
        if packet is None:
            return None
        if isinstance(packet, dict) and "data" in packet:
            packet = packet["data"]
        if packet is None:
            return None
        with DEVICE_LOCK:
            if self._is_slam:
                _, out = self.frontend(packet)   # (backend state, viz)
            else:
                out = self.frontend(packet["k"], packet)
        if self.frontend.stop_condition():
            self.shutdown_module()
        return out


class FusionModule(PipelineModule):
    """Mapping stage: NeRF or TSDF fusion with non-blocking input so the
    NGP keeps training between packets (reference fusion_module.py:30-32)."""

    def __init__(self, fusion, mode: str = "nerf",
                 parallel_run: bool = True, iters_per_spin: int = 10,
                 extra_spins_after_done: int = 50,
                 idle_sleep_s: float = 0.05):
        super().__init__("fusion", parallel_run, input_timeout=1e-3)
        self.fusion = fusion
        self.mode = mode
        self.iters_per_spin = iters_per_spin
        self.extra_spins_after_done = extra_spins_after_done
        # single-chip scheduling: the reference gives mapping its own GPU
        # (slam_demo.py:63-67); sharing one chip, an unthrottled mapping
        # busy-loop starves the tracking stream, so idle spins yield.
        # Chunk size is a duty-cycle knob, not a latency knob: 3-iter
        # chunks measured 2.12 vs 2.03 kf/s but collapsed NGP throughput
        # from ~9 to ~2.5 iters/keyframe (lock-acquisition frequency
        # bounds mapping when tracking spins are long) -- keep 10.
        self.idle_sleep_s = idle_sleep_s
        self.done = False
        self._spins_since_done = 0

    def handle_command(self, cmd: Dict[str, Any]):
        """GUI->fusion command back-channel (reference
        open3d_gui.py:369-383 output packets consumed by fusion)."""
        name = cmd.get("cmd")
        if name == "mesh" and hasattr(self.fusion, "extract_mesh"):
            out = cmd.get("path", "fusion_mesh.obj")
            try:
                self.fusion.extract_mesh(path=out)
                print(f"[fusion] mesh written to {out}")
            except TypeError:   # TsdfFusion signature
                self.fusion.extract_mesh()
        elif name == "eval":
            if hasattr(self.fusion, "evaluate_training_views"):
                row = self.fusion.evaluate_training_views()
                print(f"[fusion] eval: {row}")
        elif name == "sigma_thresh":
            # live masking threshold (reference A/S keys,
            # open3d_gui.py:181-190): NerfFusion applies it to packets
            # fused from now on; TsdfFusion to future integrations
            # (send "rebuild" to re-filter already-fused history)
            if hasattr(self.fusion, "set_sigma_thresh"):
                self.fusion.set_sigma_thresh(float(cmd.get("value",
                                                           10.0)))
        elif name == "rebuild":
            # replay the TSDF keyframe history at the current threshold
            # (reference 'Z' key, open3d_gui.py:193)
            if hasattr(self.fusion, "rebuild"):
                if "value" in cmd:
                    self.fusion.rebuild(float(cmd["value"]))
                else:
                    self.fusion.rebuild()
        elif name == "toggle_mask":
            cfg = getattr(self.fusion, "cfg", None)
            if cfg is not None and hasattr(cfg, "mask_type"):
                order = ["ours", "raw", "ours_w_thresh", "no_depth"]
                cur = order.index(cfg.mask_type) \
                    if cfg.mask_type in order else 0
                cfg.mask_type = order[(cur + 1) % len(order)]

    def spin_once(self, packet):
        import time as _time
        from ..utils.runtime import DEVICE_LOCK
        pkt = None
        gui_pkt = None
        if packet is not None and isinstance(packet, dict):
            pkt = packet.get("slam")
            gui_pkt = packet.get("gui")
        elif packet is not None:
            pkt = packet
        with DEVICE_LOCK:
            if gui_pkt is not None:
                for cmd in gui_pkt.get("gui_commands", []):
                    self.handle_command(cmd)
            if (self.mode == "nerf"
                    and hasattr(self.fusion, "fuse_and_fit")):
                # packet ingest + training fused into one dispatch
                self.done = (self.fusion.fuse_and_fit(
                    pkt, self.iters_per_spin) or self.done)
            else:
                if pkt is not None:
                    self.done = self.fusion.fuse(pkt) or self.done
                if self.mode == "nerf":
                    self.fusion.fit_volume(self.iters_per_spin)
        # yield OUTSIDE the lock so idle throttling never blocks tracking
        if pkt is None and not self.done and self.parallel_run \
                and self.idle_sleep_s > 0:
            _time.sleep(self.idle_sleep_s)
        if self.done:
            self._spins_since_done += 1
            if (self.mode != "nerf"
                    or self._spins_since_done
                    >= self.extra_spins_after_done):
                self.shutdown_module()
        return {"fusion_step": getattr(self.fusion, "iteration", 0)}


class GuiModule(PipelineModule):
    """Visualization stage wrapping HeadlessGui (reference
    gui/gui_module.py); forwards queued GUI commands to fusion through
    its output queue (the reference's GUI->fusion back-channel,
    examples/slam_demo.py:124-125)."""

    def __init__(self, gui, parallel_run: bool = True):
        super().__init__("gui", parallel_run, input_timeout=1e-3)
        self.gui = gui

    def spin_once(self, packet):
        from ..utils.runtime import DEVICE_LOCK
        pkt = None
        if packet is not None:
            pkt = packet.get("slam") if isinstance(packet, dict) \
                else packet
        if pkt is not None:
            with DEVICE_LOCK:
                self.gui.visualize(pkt)
            if pkt.get("is_last_frame"):
                self.shutdown_module()
        cmds = self.gui.pop_commands()
        if cmds:
            return {"gui_commands": cmds}
        return None


class EvalSink(PipelineModule):
    """Collects SLAM packets for post-hoc evaluation (GT poses etc.)."""

    def __init__(self, parallel_run: bool = True):
        super().__init__("eval", parallel_run)
        self.packets = []
        self.last_full: Optional[Dict[str, Any]] = None

    def spin_once(self, packet):
        if isinstance(packet, dict) and "slam" in packet:
            packet = packet["slam"]
        if packet is None:
            return None
        self.packets.append(packet)
        if "cam0_poses" in packet:
            self.last_full = packet
        if packet.get("is_last_frame"):
            self.shutdown_module()
        return packet
