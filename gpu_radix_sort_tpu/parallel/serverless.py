"""Out-of-process (serverless-style) distributed workers.

Capability mirror of the reference's FaaS layer (benchmark/pkg/faas/ +
faasTest/): the round loop stays backend-blind — a :class:`DistribWorker`
that happens to serialize its PartRefs to JSON, spawn a worker process, and
re-open the worker's output array by name.

Wire protocol (field names kept identical to the reference's JSON structs,
benchmark/pkg/faas/inputs.go:13-28, so the formats stay comparable):

  event  = {"offset": int, "width": int, "arrType": "file",
            "input":  [{"arrayName": str, "partID": int,
                        "start": int, "nbyte": int}, ...],
            "output": str}
  result = {"success": bool, "err": str}

Invocation is JSON over stdin/stdout of a spawned Python interpreter running
:mod:`gpu_radix_sort_tpu.parallel.worker_main` — the reference's
"direct invoke" path (invoke.go:118-171), which it uses in practice in
place of a real FaaS provider (invoke.go:196-200).  The shared-filesystem
rendezvous (the reference's OL_SHARED_VOLUME, benchmark.go:79) is the
``GRS_TPU_MOUNT`` env var pointing at a FileArrayFactory root.

Device ownership: the reference pins one GPU per worker via
CUDA_VISIBLE_DEVICES (invoke.go:138-139).  A TPU chip has a single owning
process, so subprocess workers default to ``JAX_PLATFORMS=cpu`` — on a real
multi-host pod each host's worker owns that host's chips and the env is
passed through unchanged (``platform=None``).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Sequence

from ..data.file import FileArrayFactory
from ..data.interface import ArrayFactory, DistribArray, PartRef

MOUNT_ENV = "GRS_TPU_MOUNT"
PROFILE_ENV = "GRS_PROFILE_DIR"
WORKER_MODULE = "gpu_radix_sort_tpu.parallel.worker_main"


def part_ref_to_wire(ref: PartRef) -> dict:
    """PartRef -> wire dict (reference: FilePartRefToFaas, inputs.go:36-44)."""
    return {
        "arrayName": ref.arr.name,
        "partID": ref.part_idx,
        "start": ref.start,
        "nbyte": ref.nbyte,
    }


def wire_to_part_ref(
    d: dict, factory: ArrayFactory, cache: dict[str, DistribArray]
) -> PartRef:
    """Wire dict -> PartRef, with an open-array cache (reference:
    LoadFaasFilePartRef, inputs.go:46-63 / pylibsort getPartRefs'
    open-array cache, data.py:280-286)."""
    name = d["arrayName"]
    arr = cache.get(name)
    if arr is None:
        arr = factory.open(name)
        cache[name] = arr
    return PartRef(arr, d["partID"], d["start"], d["nbyte"])


def build_event(
    refs: Sequence[PartRef], offset: int, width: int, out_name: str
) -> dict:
    return {
        "offset": offset,
        "width": width,
        "arrType": "file",
        "input": [part_ref_to_wire(r) for r in refs],
        "output": out_name,
    }


def handle_event(event: dict, factory: ArrayFactory) -> DistribArray:
    """Worker-side handler body (reference: f(event), faasTest/f.py:45-69):
    parse refs -> gather -> partial sort -> bucket-partitioned output."""
    from .storage_sort import local_distrib_worker

    if event.get("arrType", "file") != "file":
        raise ValueError(f"unsupported arrType {event.get('arrType')!r}")
    cache: dict[str, DistribArray] = {}
    refs = [wire_to_part_ref(d, factory, cache) for d in event["input"]]
    return local_distrib_worker(
        refs, event["offset"], event["width"], event["output"], factory
    )


def invoke_subprocess(
    event: dict,
    mount: str,
    *,
    platform: str | None = "cpu",
    profile_dir: str | None = None,
    timeout_s: float = 600.0,
) -> dict:
    """Spawn a worker process, deliver the event on stdin, parse the result
    JSON from stdout (reference: InvokeFaasDirect, invoke.go:118-171)."""
    env = dict(os.environ)
    env[MOUNT_ENV] = mount
    if platform is not None:
        env["JAX_PLATFORMS"] = platform
        if platform != "tpu":
            # A TPU chip has one owning process; make sure the child does
            # not try to claim the parent's chip (site hooks register the
            # TPU plugin in every interpreter unless this is cleared).
            env["PALLAS_AXON_POOL_IPS"] = ""
    if profile_dir is not None:
        env[PROFILE_ENV] = profile_dir
    proc = subprocess.run(
        [sys.executable, "-m", WORKER_MODULE],
        input=json.dumps(event).encode(),
        capture_output=True,
        env=env,
        timeout=timeout_s,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"worker process failed (rc={proc.returncode}): "
            f"{proc.stderr.decode(errors='replace')[-2000:]}"
        )
    try:
        return json.loads(proc.stdout.decode())
    except json.JSONDecodeError as e:
        raise RuntimeError(
            f"worker produced invalid response: {proc.stdout[-500:]!r}"
        ) from e


class WorkerPool:
    """A pool of persistent worker processes serving events over pipes.

    The reference's FaaS model spawns a fresh interpreter per invocation
    (invoke.go:118-171) — every round pays import + compile.  A pool keeps
    workers alive across rounds, so their jit caches stay warm (shard
    shapes are pow2-padded by the local worker, making cache hits the
    common case).  Thread-safe: concurrent invokes check workers out of a
    free queue, matching the round loop's ThreadPoolExecutor.

    Use as a context manager; :meth:`worker` adapts the pool into a
    :class:`DistribWorker` for ``sort_distrib_from_arr``.
    """

    def __init__(
        self,
        mount: str,
        size: int = 2,
        *,
        platform: str | None = "cpu",
        profile_dir: str | None = None,
        spawn_timeout_s: float = 120.0,
    ):
        import queue

        self._mount = mount
        self._platform = platform
        self._profile_dir = profile_dir
        self._spawn_timeout_s = spawn_timeout_s
        self._procs: list[subprocess.Popen] = []
        self._free: "queue.Queue[subprocess.Popen]" = queue.Queue()
        for _ in range(size):
            self._free.put(self._spawn())

    def _env(self) -> dict:
        env = dict(os.environ)
        env[MOUNT_ENV] = self._mount
        if self._platform is not None:
            env["JAX_PLATFORMS"] = self._platform
            if self._platform != "tpu":
                env["PALLAS_AXON_POOL_IPS"] = ""
        if self._profile_dir is not None:
            env[PROFILE_ENV] = self._profile_dir
        return env

    def _spawn(self) -> subprocess.Popen:
        proc = subprocess.Popen(
            [sys.executable, "-m", WORKER_MODULE, "--serve"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            env=self._env(),
            text=True,
        )
        ready = proc.stdout.readline()
        if not ready or not json.loads(ready).get("ready"):
            raise RuntimeError(
                f"worker failed to start (rc={proc.poll()}): {ready!r}"
            )
        self._procs.append(proc)
        return proc

    def invoke(self, event: dict) -> dict:
        proc = self._free.get()
        try:
            if proc.poll() is not None:  # died since last use: respawn
                self._procs.remove(proc)
                proc = self._spawn()
            proc.stdin.write(json.dumps(event) + "\n")
            proc.stdin.flush()
            line = proc.stdout.readline()
            if not line:
                self._procs.remove(proc)
                dead, proc = proc, self._spawn()
                raise RuntimeError(
                    f"worker process died mid-event (rc={dead.poll()})"
                )
            return json.loads(line)
        finally:
            self._free.put(proc)

    def worker(self):
        """Adapt the pool into a DistribWorker."""

        def run(in_refs, offset, width, out_name, factory):
            if not isinstance(factory, FileArrayFactory):
                raise TypeError(
                    "subprocess workers exchange data via the file backend; "
                    f"got {type(factory).__name__}"
                )
            result = self.invoke(build_event(in_refs, offset, width, out_name))
            if not result.get("success"):
                raise RuntimeError(f"worker error: {result.get('err')}")
            return factory.open(out_name)

        return run

    def close(self) -> None:
        for proc in self._procs:
            if proc.poll() is None:
                proc.stdin.close()
                try:
                    proc.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
        self._procs.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def make_subprocess_worker(
    mount: str,
    *,
    platform: str | None = "cpu",
    profile_dir: str | None = None,
):
    """Adapt subprocess invocation into a DistribWorker (reference:
    InitFaasWorker, invoke.go:174-212): serialize refs, invoke, re-open the
    worker's committed output array by name."""

    def worker(
        in_refs: Sequence[PartRef],
        offset: int,
        width: int,
        out_name: str,
        factory: ArrayFactory,
    ) -> DistribArray:
        if not isinstance(factory, FileArrayFactory):
            raise TypeError(
                "subprocess workers exchange data via the file backend; got "
                f"{type(factory).__name__}"
            )
        event = build_event(in_refs, offset, width, out_name)
        result = invoke_subprocess(
            event, mount, platform=platform, profile_dir=profile_dir
        )
        if not result.get("success"):
            raise RuntimeError(f"worker error: {result.get('err')}")
        return factory.open(out_name)

    return worker
