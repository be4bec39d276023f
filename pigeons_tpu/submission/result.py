"""Result handle over a submitted run (reference ``src/submission/Result.jl``)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass
class Result:
    """Handle to a (possibly still running) submitted run; ``load()``
    deserializes the finished PT (reference ``Result.jl:4-16``)."""

    exec_folder: str
    job_id: Optional[str] = None

    def load(self, mesh=None):
        from ..checkpoint import load_pt

        return load_pt(self.exec_folder, mesh=mesh)
