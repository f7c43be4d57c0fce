"""SLAM class hierarchy.

Equivalent of /root/reference/slam/meta_slam.py + vio_slam.py: the SLAM
ABC whose forward runs frontend -> factor accumulation -> backend solve,
and the concrete visual(-inertial) SLAM wiring the RAFT frontend with the
incremental backend.  In the reference the visual frontend already solves
its own DBA and the backend solves an empty GTSAM graph
(vio_slam.py:112-126); we keep the same structure so inertial or other
factors can join the backend graph.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..solver.factor_graph import FactorGraph, Variables
from ..solver.nonlinear import IncrementalSolver


class SLAM(ABC):
    """meta_slam.py:14-54 contract."""

    def __init__(self, name: str, device: str = "tpu"):
        self.name = name
        self.device = device
        self.graph = FactorGraph()
        self.backend = IncrementalSolver()

    def __call__(self, batch: Dict[str, Any]):
        """forward: frontend -> add factors -> backend solve."""
        x0, factors, viz_out = self._frontend(batch)
        if factors is not None and len(factors):
            for f in factors.factors.values():
                self.graph.add(f)
        state = None
        if len(self.graph) and x0 is not None:
            state = self.backend.update(self.graph, x0)
        return state, viz_out

    @abstractmethod
    def _frontend(self, batch) -> Tuple[Optional[Variables],
                                        Optional[FactorGraph], Any]:
        ...

    def stop_condition(self) -> bool:
        return False


class VioSLAM(SLAM):
    """Visual(-inertial) SLAM (vio_slam.py:78-127): the visual frontend
    runs its DBA internally; an optional inertial frontend contributes
    preintegrated factors to the backend graph."""

    def __init__(self, visual_frontend, inertial_frontend=None,
                 device: str = "tpu"):
        super().__init__("VioSLAM", device)
        self.visual_frontend = visual_frontend
        self.inertial_frontend = inertial_frontend

    def _frontend(self, batch):
        viz_out = self.visual_frontend(batch["k"], batch)
        x0, factors = None, None
        if self.inertial_frontend is not None:
            # the frontend gates on imu_t0_t1 itself (frame 0 has no
            # window but must seed the state-0 priors)
            x0, factors = self.inertial_frontend(batch)
        return x0, factors, viz_out

    def stop_condition(self) -> bool:
        return self.visual_frontend.stop_condition()
