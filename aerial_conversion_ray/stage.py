"""Extension surface (SURVEY.md §2j): the Stage protocol + compose.

The reference extends via new scripts around ``aerial_conversion``'s
module functions; this engine's unit of extension is a STAGE — any
callable ``Dataset -> Dataset``.  Three idioms, all plain Ray Data:

- a free function wrapping ``ds.map_batches(fn, ...)`` (stateless),
- a callable class run as an actor pool (stateful setup in
  ``__init__``; see ``pipelines/spatial.PointTileAssign``),
- a :class:`BatchStage` adapter that lifts a batch kernel
  (``pa.Table -> pa.Table``) into a stage with the engine's batching
  conventions applied.

``compose(*stages)`` chains stages left-to-right into one stage;
:class:`Pipeline` names the composition and carries its
:class:`~aerial_conversion_ray.config.EngineConfig` so user pipelines
are declared the same way the built-in gated queries are.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

import ray.data

from .config import EngineConfig

Batch = "pyarrow.Table | pandas.DataFrame"


@runtime_checkable
class Stage(Protocol):
    """Anything mapping a Dataset to a Dataset."""

    def __call__(self, ds: ray.data.Dataset) -> ray.data.Dataset: ...


@dataclass(frozen=True)
class BatchStage:
    """Lift a batch kernel into a Stage with the engine's conventions
    (zero-copy Arrow by default; pass ``concurrency`` to make it an
    actor pool for class kernels with per-actor setup)."""

    fn: Callable
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: int | None = None
    num_cpus: float | None = None

    def __call__(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        kw: dict = {"batch_format": self.batch_format}
        if self.batch_size is not None:
            kw["batch_size"] = self.batch_size
        if self.concurrency is not None:
            kw["concurrency"] = self.concurrency
        if self.num_cpus is not None:
            kw["num_cpus"] = self.num_cpus
        return ds.map_batches(self.fn, **kw)


def compose(*stages: Stage) -> Stage:
    """Left-to-right stage composition: ``compose(a, b)(ds) == b(a(ds))``."""

    def run(ds: ray.data.Dataset) -> ray.data.Dataset:
        for st in stages:
            ds = st(ds)
        return ds

    return run


@dataclass(frozen=True)
class Pipeline:
    """A named stage chain + its config: the user-facing unit that
    mirrors the built-in ``queries()`` entries."""

    name: str
    stages: tuple = ()
    cfg: EngineConfig = field(default_factory=EngineConfig)

    def __call__(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return compose(*self.stages)(ds)

    def with_stage(self, stage: Stage) -> "Pipeline":
        return Pipeline(self.name, self.stages + (stage,), self.cfg)
