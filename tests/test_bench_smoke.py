"""bench.py driver contract: runs end-to-end and prints exactly one
JSON line with the required keys."""

import json
import sys


def test_bench_smoke(capsys, monkeypatch):
    import bench

    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--width", "16", "--height", "12", "--spp", "1",
        "--frames", "2", "--mesh", "cube.obj",
        # the MSE subprocess would compile a 256x256 engine (minutes on
        # XLA:CPU) and the settle loop would wait out the test suite's
        # own load -- both are driver-run features, not test features
        "--no-mse", "--settle-seconds", "0",
    ])
    rc = bench.main()
    assert rc == 0
    out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip()]
    assert len(out_lines) == 1, f"stdout must be ONE JSON line: {out_lines}"
    result = json.loads(out_lines[0])
    for key in ("metric", "value", "unit", "vs_baseline", "frame_seconds",
                "warnings", "loadavg_start", "host_cores"):
        assert key in result, f"missing {key}"
    assert result["unit"] == "Mrays/s"
    assert result["value"] > 0
    assert len(result["frame_seconds"]) >= 2
    # both fields are independently rounded in the report
    assert abs(result["vs_baseline"] - result["value"] / 200.0) < 5e-4


def test_bench_shard_mesh_dryrun(capsys, monkeypatch):
    """bench.py --shard-mesh runs the whole-mesh sharded step (here on
    the conftest's 8 virtual CPU devices) and reports mesh-scoped
    Mrays/s with psum'd ray counts."""
    import bench

    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--width", "16", "--height", "12", "--spp", "2",
        "--frames", "1", "--mesh", "cube.obj", "--shard-mesh", "4,2",
        "--no-mse", "--settle-seconds", "0",
    ])
    rc = bench.main()
    assert rc == 0
    out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip()]
    assert len(out_lines) == 1
    result = json.loads(out_lines[0])
    assert "4,2 (dp,sp) mesh" in result["metric"]
    assert result["value"] > 0
    # ray counts are frame properties: 16x12x2spp traces the same rays
    # sharded or not, and vs_baseline is scaled per-chip (x8 here)
    assert result["rays_per_frame"] > 16 * 12 * 2
    assert abs(result["vs_baseline"]
               - result["value"] / 1600.0) < 5e-4


def test_dryrun_multichip_production_config(capsys):
    """__graft_entry__.dryrun_multichip must certify the PRODUCTION
    step program too (VERDICT r3 #6): its second shape runs the
    default config (auto leaf/cadence, spill ladder, inline TEXG
    texture service) under shard_map on the 8-device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "[dryrun_multichip] OK:" in out
    assert "production config" in out


def test_cli_bench_config_forwards_traversal(monkeypatch, capsys):
    """`tpurt bench --config X --traversal pair` must reach the
    RenderConfig (it was silently dropped before round 2)."""
    from tryraytrace_tpu import benchmarks, cli

    seen = {}

    def fake_run_config(name, frames=2, engine=None, fly=False,
                        cfg_kw=None):
        seen["name"], seen["cfg_kw"] = name, cfg_kw
        return {"config": name}

    monkeypatch.setattr(benchmarks, "run_config", fake_run_config)
    monkeypatch.setattr(sys, "argv", [
        "tpurt", "bench", "--config", "cow800", "--traversal", "pair",
        "--leaf-size", "6",
    ])
    rc = cli.main()
    assert rc == 0
    assert seen["name"] == "cow800"
    assert seen["cfg_kw"] == {"bvh_leaf_size": 6, "traversal": "pair"}
    capsys.readouterr()
