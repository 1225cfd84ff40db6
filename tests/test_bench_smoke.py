"""bench.py driver contract: runs end-to-end and prints exactly one
JSON line with the required keys."""

import json
import sys


def test_bench_smoke(capsys, monkeypatch):
    import bench

    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--width", "16", "--height", "12", "--spp", "1",
        "--frames", "1", "--mesh", "cube.obj",
    ])
    rc = bench.main()
    assert rc == 0
    out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip()]
    assert len(out_lines) == 1, f"stdout must be ONE JSON line: {out_lines}"
    result = json.loads(out_lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in result, f"missing {key}"
    assert result["unit"] == "Mrays/s"
    assert result["value"] > 0
    # both fields are independently rounded in the report
    assert abs(result["vs_baseline"] - result["value"] / 200.0) < 5e-4
