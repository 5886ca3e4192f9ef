"""BucketReader + storage-mediated distributed sort suite.

Mirrors the reference's Go test structure (SURVEY.md §4): the provenance-
encoded BucketReader fixture (testHelpers.go:123-154 — values encode
(part_id, arr_id) so traversal order is computable arithmetically), the
ReadRef splitting semantics tests (distrib_test.go:72-149), and the
worker-parametric DistribWorkerTest / SortDistribTest suites
(testHelpers.go:324-448, distrib_test.go:14-24) instantiated over all
storage backends.  Adds checkpoint/resume coverage, which the reference
lacks (SURVEY.md §5 flags it as the natural extension of the round loop).
"""

import numpy as np
import pytest

import gpu_radix_sort_tpu.utils.checks as checks
from gpu_radix_sort_tpu.data import (
    DeviceArrayFactory,
    FileArrayFactory,
    MemArrayFactory,
    create_shape,
    fetch_part_refs,
)
from gpu_radix_sort_tpu.parallel import (
    BucketReader,
    ReadOrder,
    load_checkpoint,
    local_distrib_worker,
    resume_sort_distrib,
    sort_distrib_from_arr,
    sort_distrib_from_raw,
)
from gpu_radix_sort_tpu.utils.keygen import Pcg32


@pytest.fixture(params=["mem", "file", "device"])
def factory(request, tmp_path):
    if request.param == "mem":
        return MemArrayFactory()
    if request.param == "file":
        return FileArrayFactory(str(tmp_path / "arrays"))
    return DeviceArrayFactory()


# ---------------------------------------------------------------------------
# BucketReader fixture: provenance-encoded values
# ---------------------------------------------------------------------------

# (array, [partition lengths in elements]) — ragged npart, zero-len parts.
ARR_PART_LENS = [[3, 0, 5], [2, 4], [0, 1, 2, 6]]


def _provenance_arrays(factory):
    """value = (part_idx << 8) | arr_idx | (elem_idx << 16): global traversal
    order is computable from the encoding alone (reference pattern:
    testHelpers.go:123-154)."""
    arrays = []
    for ai, lens in enumerate(ARR_PART_LENS):
        arr = factory.create(f"prov{ai}", create_shape([ln * 4 for ln in lens]))
        for pi, ln in enumerate(lens):
            vals = np.array(
                [(e << 16) | (pi << 8) | ai for e in range(ln)], dtype=np.uint32
            )
            arr.write_part(pi, vals.tobytes())
        arr.close()
        arrays.append(arr)
    return arrays


def _expected_stream(order: ReadOrder) -> np.ndarray:
    out = []
    if order is ReadOrder.STRIDED:
        max_np = max(len(lens) for lens in ARR_PART_LENS)
        seq = [
            (ai, pi)
            for pi in range(max_np)
            for ai in range(len(ARR_PART_LENS))
            if pi < len(ARR_PART_LENS[ai])
        ]
    else:
        seq = [
            (ai, pi)
            for ai in range(len(ARR_PART_LENS))
            for pi in range(len(ARR_PART_LENS[ai]))
        ]
    for ai, pi in seq:
        for e in range(ARR_PART_LENS[ai][pi]):
            out.append((e << 16) | (pi << 8) | ai)
    return np.array(out, dtype=np.uint32)


@pytest.mark.parametrize("order", [ReadOrder.STRIDED, ReadOrder.INORDER])
def test_bucket_reader_read_all(factory, order):
    arrays = _provenance_arrays(factory)
    reader = BucketReader(arrays, order)
    got = np.frombuffer(reader.read(), dtype=np.uint32)
    np.testing.assert_array_equal(got, _expected_stream(order))


def test_bucket_reader_unaligned_chunks(factory):
    arrays = _provenance_arrays(factory)
    reader = BucketReader(arrays, ReadOrder.STRIDED)
    stream = b""
    for chunk_size in [1, 7, 13, 2, 100000]:  # crosses partition boundaries
        got = reader.read(chunk_size)
        stream += got
        if not got:
            break
    np.testing.assert_array_equal(
        np.frombuffer(stream, dtype=np.uint32), _expected_stream(ReadOrder.STRIDED)
    )
    assert reader.read(10) == b""  # EOF stays EOF


@pytest.mark.parametrize("order", [ReadOrder.STRIDED, ReadOrder.INORDER])
def test_bucket_reader_read_ref(factory, order):
    """read_ref covers the stream exactly, splits across partitions, and
    returns short at EOF (reference: distrib_test.go:72-149)."""
    arrays = _provenance_arrays(factory)
    reader = BucketReader(arrays, order)
    total = reader.total_bytes
    assert total == _expected_stream(order).size * 4

    refs1 = reader.read_ref(30)  # unaligned to any partition boundary
    assert sum(r.nbyte for r in refs1) == 30
    refs2 = reader.read_ref(total)  # more than remains -> short
    assert sum(r.nbyte for r in refs2) == total - 30
    assert reader.read_ref(8) == []  # EOF

    gathered = bytes(fetch_part_refs(refs1)) + bytes(fetch_part_refs(refs2))
    np.testing.assert_array_equal(
        np.frombuffer(gathered, dtype=np.uint32), _expected_stream(order)
    )


def test_bucket_reader_zero_parts(factory):
    arr = factory.create("allzero", create_shape([0, 0]))
    arr.close()
    reader = BucketReader([arr], ReadOrder.STRIDED)
    assert reader.total_bytes == 0
    assert reader.read() == b""
    assert reader.read_ref(4) == []


# ---------------------------------------------------------------------------
# Worker-parametric round test (reference: DistribWorkerTest)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("width,offset", [(4, 0), (8, 8), (8, 24)])
def test_local_worker_one_round(factory, width, offset):
    keys = Pcg32().fill(1021)  # odd size, reference's corner-case choice
    arr = factory.create("in", create_shape([keys.size * 4]))
    arr.write_part(0, keys.tobytes())
    arr.close()
    reader = BucketReader([arr], ReadOrder.STRIDED)
    refs = reader.read_ref(keys.size * 4)

    out = local_distrib_worker(refs, offset, width, "out", factory)

    shape = out.get_shape()
    assert shape.npart == 1 << width
    # per-bucket sizes match the histogram oracle
    want_counts = checks.true_bucket_counts(keys, offset, width)
    np.testing.assert_array_equal(
        np.array(shape.lens) // 4, want_counts
    )
    # linearized output is the stable partial sort
    got = np.frombuffer(out.read_all(), dtype=np.uint32)
    assert checks.check_partial(got, keys, offset, width)
    # open-by-name sees committed data (cross-worker visibility contract)
    again = factory.open("out")
    assert again.get_shape().lens == shape.lens


# ---------------------------------------------------------------------------
# End-to-end distributed sort (reference: SortDistribTest, n=1111)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("width,nworker", [(8, 2), (8, 3), (4, 1)])
def test_sort_distrib_from_raw(factory, width, nworker):
    keys = Pcg32().fill(1111)
    got = sort_distrib_from_raw(
        keys, "e2e", factory, local_distrib_worker, width=width, nworker=nworker
    )
    assert checks.check_sort_full(got, keys)


def test_device_fused_loop_engages_and_matches_legacy():
    """The device backend's fused single-program round loop (VERDICT r2
    item 2) must (a) actually engage — the per-shard worker callable is
    never invoked — and (b) produce byte-identical per-round output arrays
    (names, partition lens, STRIDED traversal) to the legacy per-worker
    path on the mem backend."""
    keys = Pcg32(state=3).fill(5000)
    calls = []

    def spy_worker(*a, **k):
        calls.append(a[3])
        return local_distrib_worker(*a, **k)

    spy_worker._fused_device_strategy = None  # fused-eligible, like stock
    dev = DeviceArrayFactory()
    got = sort_distrib_from_raw(
        keys, "fused", dev, spy_worker, width=8, nworker=3
    )
    assert not calls, "fused device loop must bypass the worker"
    np.testing.assert_array_equal(got, np.sort(keys))

    # Cross-backend contract: same final arrays from the legacy mem path.
    from gpu_radix_sort_tpu.parallel import sort_distrib_from_arr

    def run(factory, tag):
        arr = factory.create("in." + tag, create_shape([keys.size * 4]))
        arr.write_part(0, keys.tobytes())
        arr.close()
        outs = sort_distrib_from_arr(
            [arr], tag, factory, local_distrib_worker, width=8, nworker=3
        )
        lens = [o.get_shape().lens for o in outs]
        stream = BucketReader(outs, ReadOrder.STRIDED).read()
        return lens, stream

    lens_d, stream_d = run(DeviceArrayFactory(), "xd")
    lens_m, stream_m = run(MemArrayFactory(), "xm")
    assert lens_d == lens_m
    assert stream_d == stream_m


def test_device_fused_loop_pinned_strategy_uses_worker():
    """A pinned kernel strategy disables the fused path (it must go through
    sort_partial_counts), falling back to the per-worker loop."""
    from gpu_radix_sort_tpu.parallel.storage_sort import make_local_worker

    keys = Pcg32(state=5).fill(2048)
    worker = make_local_worker(strategy="xla")
    assert worker._fused_device_strategy == "xla"
    got = sort_distrib_from_raw(
        keys, "pinned", DeviceArrayFactory(), worker, width=8, nworker=2
    )
    np.testing.assert_array_equal(got, np.sort(keys))


def test_sort_distrib_width16_mem():
    """65536 buckets per round (the reference's 16b config, benchmark.go)."""
    keys = Pcg32().fill(4099)
    got = sort_distrib_from_raw(
        keys, "w16", MemArrayFactory(), local_distrib_worker, width=16
    )
    assert checks.check_sort_full(got, keys)


def test_sort_distrib_stats():
    from gpu_radix_sort_tpu.utils.timers import SortStats

    stats = SortStats()
    keys = Pcg32().fill(512)
    sort_distrib_from_raw(
        keys, "stats", MemArrayFactory(), local_distrib_worker, stats=stats
    )
    rep = stats.report()
    assert rep["workers"]["n"] == 4  # 32/8 rounds
    assert rep["counter:rounds"] == 4
    assert {"split", "workers", "destroy", "stage_input", "linearize"} <= set(
        rep
    ) - {"counter:rounds"}


# ---------------------------------------------------------------------------
# KV rows through the byte-blind plane (BASELINE config 3 machinery)
# ---------------------------------------------------------------------------

def _kv_rows(n, payload_bytes, *, dup_mask=None, seed_keys=None):
    keys = seed_keys if seed_keys is not None else Pcg32().fill(n)
    if dup_mask is not None:
        keys = (keys & np.uint32(dup_mask)).astype(np.uint32)
    # payload row r encodes its original index (stability witness)
    payload = np.zeros((n, payload_bytes), dtype=np.uint8)
    idx_bytes = np.arange(n, dtype=np.uint32).view(np.uint8).reshape(n, 4)
    payload[:, : min(4, payload_bytes)] = idx_bytes[:, : min(4, payload_bytes)]
    if payload_bytes > 4:
        payload[:, 4:] = (np.arange(n, dtype=np.uint64)[:, None] % 251).astype(
            np.uint8
        )
    return keys, payload


def test_kv_worker_one_round(factory):
    from gpu_radix_sort_tpu.parallel import local_distrib_worker_kv

    n, pb = 1021, 12
    keys, payload = _kv_rows(n, pb, dup_mask=0xFFF)
    row_bytes = 4 + pb
    rows = np.empty((n, row_bytes), dtype=np.uint8)
    rows[:, :4] = keys.view(np.uint8).reshape(n, 4)
    rows[:, 4:] = payload
    arr = factory.create("kvin", create_shape([n * row_bytes]))
    arr.write_part(0, rows.tobytes())
    arr.close()
    refs = BucketReader([arr], ReadOrder.STRIDED).read_ref(n * row_bytes)

    out = local_distrib_worker_kv(
        refs, 8, 8, "kvout", factory, row_bytes=row_bytes
    )
    shape = out.get_shape()
    assert shape.npart == 256
    want_counts = checks.true_bucket_counts(keys, 8, 8)
    np.testing.assert_array_equal(
        np.array(shape.lens) // row_bytes, want_counts
    )
    got = np.frombuffer(out.read_all(), dtype=np.uint8).reshape(-1, row_bytes)
    got_keys = np.ascontiguousarray(got[:, :4]).view(np.uint32).reshape(-1)
    order = np.argsort((keys >> 8) & 0xFF, kind="stable")
    np.testing.assert_array_equal(got_keys, keys[order])
    np.testing.assert_array_equal(got[:, 4:], payload[order])


@pytest.mark.parametrize("payload_bytes,width,nworker", [
    (12, 8, 2),   # 16B rows, reference round structure
    (5, 8, 3),    # 9B rows: odd row width through the byte-blind plane
    (12, 4, 2),   # 8 rounds
])
def test_sort_distrib_from_raw_kv(factory, payload_bytes, width, nworker):
    from gpu_radix_sort_tpu.parallel import sort_distrib_from_raw_kv

    n = 1111
    keys, payload = _kv_rows(n, payload_bytes, dup_mask=0x3FF)  # many dups
    gk, gp = sort_distrib_from_raw_kv(
        keys, payload, "kve2e", factory, width=width, nworker=nworker
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(gk, keys[order])
    np.testing.assert_array_equal(gp, payload[order])


def test_kv_subprocess_worker(tmp_path):
    """kv rows over the JSON wire protocol + file plane (rowBytes field)."""
    from gpu_radix_sort_tpu.parallel import sort_distrib_from_raw_kv
    from gpu_radix_sort_tpu.parallel.serverless import make_subprocess_worker

    mount = str(tmp_path / "shared")
    factory = FileArrayFactory(mount)
    n, pb = 257, 8
    keys, payload = _kv_rows(n, pb, dup_mask=0xFF)
    worker = make_subprocess_worker(mount, row_bytes=4 + pb)
    gk, gp = sort_distrib_from_raw_kv(
        keys, payload, "kvproc", factory, worker, width=16, nworker=2
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(gk, keys[order])
    np.testing.assert_array_equal(gp, payload[order])


def test_kv_checkpoint_resume(tmp_path):
    """row_bytes survives the manifest; resume completes a kv sort."""
    from gpu_radix_sort_tpu.parallel import (
        make_kv_worker,
        sort_distrib_from_arr,
    )

    factory = FileArrayFactory(str(tmp_path / "arrays"))
    ckpt_dir = str(tmp_path / "ckpt")
    n, pb = 513, 12
    row_bytes = 4 + pb
    keys, payload = _kv_rows(n, pb)
    rows = np.empty((n, row_bytes), dtype=np.uint8)
    rows[:, :4] = keys.view(np.uint8).reshape(n, 4)
    rows[:, 4:] = payload
    arr_in = factory.create("kvck.input", create_shape([n * row_bytes]))
    arr_in.write_part(0, rows.tobytes())
    arr_in.close()

    kv_worker = make_kv_worker(row_bytes)

    def crashing(refs, offset, width, out_name, fac):
        if out_name == "kvck.s2.w0":
            raise RuntimeError("injected crash")
        return kv_worker(refs, offset, width, out_name, fac)

    with pytest.raises(RuntimeError, match="injected crash"):
        sort_distrib_from_arr(
            [arr_in], "kvck", factory, crashing,
            width=8, nworker=2, checkpoint_dir=ckpt_dir, row_bytes=row_bytes,
        )
    manifest = load_checkpoint(ckpt_dir, "kvck")
    assert manifest["row_bytes"] == row_bytes

    outputs = resume_sort_distrib(
        "kvck", factory, kv_worker, ckpt_dir, nworker=2
    )
    raw = BucketReader(outputs, ReadOrder.STRIDED).read()
    got = np.frombuffer(raw, dtype=np.uint8).reshape(-1, row_bytes)
    got_keys = np.ascontiguousarray(got[:, :4]).view(np.uint32).reshape(-1)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(got_keys, keys[order])
    np.testing.assert_array_equal(got[:, 4:], payload[order])


# ---------------------------------------------------------------------------
# Checkpoint / resume
# ---------------------------------------------------------------------------

def test_checkpoint_resume_after_crash(tmp_path):
    factory = FileArrayFactory(str(tmp_path / "arrays"))
    ckpt_dir = str(tmp_path / "ckpt")
    keys = Pcg32().fill(1111)

    arr_in = factory.create("ck.input", create_shape([keys.size * 4]))
    arr_in.write_part(0, keys.tobytes())
    arr_in.close()

    def crashing_worker(refs, offset, width, out_name, fac):
        if out_name == "ck.s2.w1":  # die mid-round-2: worker 0 may finish
            raise RuntimeError("injected crash")
        return local_distrib_worker(refs, offset, width, out_name, fac)

    with pytest.raises(RuntimeError, match="injected crash"):
        sort_distrib_from_arr(
            [arr_in], "ck", factory, crashing_worker,
            width=8, nworker=2, checkpoint_dir=ckpt_dir,
        )

    manifest = load_checkpoint(ckpt_dir, "ck")
    assert manifest["completed_step"] == 1  # rounds 0,1 committed
    assert manifest["width"] == 8

    outputs = resume_sort_distrib(
        "ck", factory, local_distrib_worker, ckpt_dir, nworker=2
    )
    raw = BucketReader(outputs, ReadOrder.STRIDED).read()
    got = np.frombuffer(raw, dtype=np.uint32)
    assert checks.check_sort_full(got, keys)


def test_resume_without_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        resume_sort_distrib(
            "missing", FileArrayFactory(str(tmp_path)), local_distrib_worker,
            str(tmp_path / "none"),
        )
