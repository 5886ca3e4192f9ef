"""Config, CLI, and benchmark-harness tests (the L6 driver surface)."""

import json

import numpy as np
import pytest

from gpu_radix_sort_tpu.cli import main as cli_main
from gpu_radix_sort_tpu.utils.config import SortConfig


# ---------------------------------------------------------------------------
# SortConfig
# ---------------------------------------------------------------------------

def test_config_defaults_valid():
    SortConfig().validate()


@pytest.mark.parametrize(
    "kw",
    [
        {"width": 5},
        {"width": 0},
        {"nworker": 0},
        {"strategy": "cuda"},
        {"exchange": "nccl"},
        {"backend": "s3"},
        {"worker": "faas"},
        {"worker": "subprocess", "backend": "mem"},
        {"backend": "file", "mount": None},
    ],
)
def test_config_rejects(kw):
    with pytest.raises(ValueError):
        SortConfig(**kw).validate()


def test_config_env_precedence(monkeypatch):
    monkeypatch.setenv("GRS_WIDTH", "16")
    monkeypatch.setenv("GRS_NWORKER", "4")
    cfg = SortConfig.from_env()
    assert cfg.width == 16 and cfg.nworker == 4
    # explicit overrides beat env
    assert SortConfig.from_env(width=8).width == 8
    monkeypatch.setenv("GRS_WIDTH", "not_an_int")
    with pytest.raises(ValueError, match="GRS_WIDTH"):
        SortConfig.from_env()


def test_config_factories(tmp_path):
    from gpu_radix_sort_tpu.data import (
        DeviceArrayFactory,
        FileArrayFactory,
        MemArrayFactory,
    )

    assert isinstance(SortConfig().make_factory(), MemArrayFactory)
    assert isinstance(
        SortConfig(backend="device").make_factory(), DeviceArrayFactory
    )
    f = SortConfig(backend="file", mount=str(tmp_path)).make_factory()
    assert isinstance(f, FileArrayFactory)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_gen_sort_verify_roundtrip(tmp_path, capsys):
    keyfile = str(tmp_path / "keys.bin")
    outfile = str(tmp_path / "sorted.bin")
    assert cli_main(["gen", "--n", "4099", "--out", keyfile]) == 0
    raw = np.fromfile(keyfile, dtype=np.uint32)
    from gpu_radix_sort_tpu.utils.keygen import Pcg32

    np.testing.assert_array_equal(raw, Pcg32().fill(4099))

    rc = cli_main(
        ["sort", "--in", keyfile, "--out", outfile, "--verify"]
    )
    assert rc == 0
    got = np.fromfile(outfile, dtype=np.uint32)
    np.testing.assert_array_equal(got, np.sort(raw))


@pytest.mark.parametrize("mode,extra", [
    ("mesh", ["--width", "16"]),
    ("sample", []),
    ("storage", ["--backend", "mem", "--nworker", "3"]),
])
def test_cli_sort_modes(mode, extra):
    assert cli_main(["sort", "--mode", mode, "--n", "3000", "--verify", *extra]) == 0


def test_cli_selftest():
    assert cli_main(["selftest", "--n", "5000"]) == 0


# ---------------------------------------------------------------------------
# Bench harness
# ---------------------------------------------------------------------------

def test_bench_records_and_report():
    from gpu_radix_sort_tpu.bench import (
        bench_full_sort,
        bench_keygen,
        bench_mesh_sample,
        bench_storage_distrib,
        report,
    )

    recs = [
        bench_keygen(1 << 16, reps=2),
        bench_full_sort(1 << 14, reps=2),
        bench_mesh_sample(1 << 11, reps=2),
        bench_storage_distrib(1 << 12, SortConfig(backend="mem"), reps=1),
    ]
    for r in recs:
        assert r.median_s > 0 and r.rate_per_s > 0
    txt = report(recs)
    assert "full_sort_u32" in txt and "keygen_pcg32" in txt
    lines = report(recs, as_json=True).splitlines()
    assert len(lines) == len(recs)
    parsed = json.loads(lines[-1])
    assert parsed["extra"]["phases"]["counter:rounds"] == 4.0


def test_bench_storage_has_phase_stats():
    from gpu_radix_sort_tpu.bench import bench_storage_distrib

    rec = bench_storage_distrib(1 << 12, SortConfig(backend="device"), reps=1)
    phases = rec.extra["phases"]
    # deep-fused device loop (no checkpointing): ONE program for all 4
    # rounds — one sample per phase per rep, rounds counted via counter
    # (VERDICT r3 item 2 breakdown)
    for phase in ("round_sort", "counts_d2h", "commit"):
        assert phases[phase]["n"] == 1
    assert phases["counter:rounds"] == 4.0


def test_cli_analyze_single_and_compare(tmp_path, capsys):
    import json as _json

    from gpu_radix_sort_tpu.bench import BenchRecord

    def rec(name, rate, phases=None):
        r = BenchRecord(name=name, n=1000, reps=2, median_s=1e-3,
                        mean_s=1e-3, stdev_s=0.0, rate_per_s=rate,
                        extra={"phases": phases} if phases else {})
        return _json.dumps(r.to_dict())

    r1 = tmp_path / "r1.jsonl"
    r2 = tmp_path / "r2.jsonl"
    phases = {"workers": {"total_s": 0.08, "mean_s": 0.02, "stdev_s": 0.0,
                          "n": 4},
              "split": {"total_s": 0.02, "mean_s": 0.005, "stdev_s": 0.0,
                        "n": 4}}
    r1.write_text(rec("full_sort", 100e6, phases) + "\n")
    r2.write_text(rec("full_sort", 150e6) + "\n" + rec("new_bench", 5e6))

    assert cli_main(["analyze", str(r1)]) == 0
    out = capsys.readouterr().out
    assert "workers" in out and "80.0%" in out

    assert cli_main(["analyze", str(r1), str(r2)]) == 0
    out = capsys.readouterr().out
    assert "1.50x" in out and "new_bench" in out


def test_config_pool_worker(tmp_path):
    cfg = SortConfig(worker="pool", backend="file", mount=str(tmp_path))
    cfg.validate()
    with pytest.raises(ValueError, match="pool workers require"):
        SortConfig(worker="pool", backend="mem").validate()


def test_bench_scaling_suite():
    from gpu_radix_sort_tpu.bench.harness import run_scaling

    recs = run_scaling(1 << 11, reps=1)
    assert len(recs) >= 3  # 1, 2, 4, 8 virtual devices
    assert recs[0].extra["efficiency_vs_1chip"] == 1.0
    for r in recs:
        assert r.rate_per_s > 0
        assert "per_chip_rate" in r.extra
