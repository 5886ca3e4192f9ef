"""Flagship execution pipelines.

The framework's "model families" are sort-execution pipelines — the
counterpart of the reference's driver programs (localTest benchmarks,
benchmark/pkg/benchmark):

  * :class:`FullSortPipeline`        — single-chip full sort
    (reference: providedGpu path, invokers.cu:45).
  * :class:`PartialSortPipeline`     — single-chip partial sort + boundaries
    (reference: gpuPartial path, invokers.cu:15).
  * :class:`DistributedSortPipeline` — mesh-wide multi-round sort
    (reference: SortDistribFromRaw, distrib.go:183).

Each pipeline exposes ``build()`` returning a jitted step function plus
example inputs, so drivers/benchmarks/compile-checks share one definition.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import radix_sort
from ..parallel import distributed
from ..parallel.mesh import KEY_AXIS, key_mesh
from ..utils.keygen import Pcg32


@dataclass
class FullSortPipeline:
    n: int = 1 << 20
    strategy: str | None = None

    def build(self):
        strategy = self.strategy

        def step(keys):
            return radix_sort.sort_full(keys, strategy=strategy)

        example = jnp.asarray(Pcg32().fill(self.n))
        return jax.jit(step), (example,)


@dataclass
class PartialSortPipeline:
    n: int = 1 << 20
    offset: int = 0
    width: int = 8
    strategy: str | None = None

    def build(self):
        offset, width, strategy = self.offset, self.width, self.strategy

        def step(keys):
            return radix_sort.sort_partial(keys, offset, width, strategy=strategy)

        example = jnp.asarray(Pcg32().fill(self.n))
        return jax.jit(step), (example,)


@dataclass
class HashAggregatePipeline:
    """Skew-aware distributed group-by (BASELINE.json config 5): hash
    partition with sampled splitters, optional filter predicate, local
    combine + global aggregate over the mesh."""

    n_local: int = 1 << 14
    op: str = "count"
    zipf_alpha: float = 1.2
    capacity_factor: float = 2.0
    mesh: object = None

    def build(self):
        from ..parallel.pipeline import build_hash_aggregate
        from ..utils.keygen import generate_zipf_keys

        mesh = self.mesh or key_mesh()
        nchips = mesh.shape[KEY_AXIS]
        n = self.n_local * nchips
        fn, _cap = build_hash_aggregate(
            mesh, self.n_local, op=self.op,
            capacity_factor=self.capacity_factor,
        )
        sharding = NamedSharding(mesh, P(KEY_AXIS))
        keys = jax.device_put(
            generate_zipf_keys(n, alpha=self.zipf_alpha, seed=9), sharding
        )
        vals = jax.device_put(np.ones(n, dtype=np.float32), sharding)
        valid = jax.device_put(np.ones(n, dtype=bool), sharding)
        return fn, (keys, vals, valid)


@dataclass
class DistributedSortPipeline:
    """Full training-step analog: the distributed sort with real shardings
    over the mesh.  ``algorithm``: "lsd" = reference-parity 32/width radix
    rounds; "sample" = PSRS performance mode (one local sort + one
    splitter exchange).  NOTE: the sample path enforces a capacity_factor
    floor of 1.5 — splitter balance is approximate, and factors below
    that overflow on ordinary inputs, so lower settings are raised to it."""

    n_local: int = 1 << 16
    width: int = 8
    algorithm: str = "lsd"
    exchange: str = "alltoall"
    capacity_factor: float = 1.25
    strategy: str | None = None
    mesh: object = None

    def build(self):
        mesh = self.mesh or key_mesh()
        if self.algorithm == "sample":
            # PSRS takes no digit width / exchange / kernel strategy —
            # surface explicit non-default settings instead of silently
            # measuring a different configuration.  Both "alltoall" (this
            # class's default) and "auto" (sort_distributed's default) are
            # treated as unset so drivers sweeping algorithms with a common
            # exchange="auto" keep working.
            if self.strategy is not None or self.exchange not in ("alltoall", "auto"):
                raise ValueError(
                    "algorithm='sample' ignores strategy/exchange; leave "
                    "them at defaults or use algorithm='lsd'"
                )
            from ..parallel import sample_sort

            fn, _ = sample_sort.build_sample_sort(
                mesh, self.n_local, capacity_factor=max(self.capacity_factor, 1.5)
            )
        else:
            fn = distributed.build_distributed_sort(
                mesh,
                self.n_local,
                width=self.width,
                exchange=self.exchange,
                capacity_factor=self.capacity_factor,
                strategy=self.strategy,
            )
        n_global = self.n_local * mesh.shape[KEY_AXIS]
        example = jax.device_put(
            np.asarray(Pcg32().fill(n_global)),
            NamedSharding(mesh, P(KEY_AXIS)),
        )
        return fn, (example,)
