"""Run a LIVE roofline scorecard and refresh the committed per-chip artifact
(benchmarks/mfu_v5e.json) — gives newly added kernels (the fused in-VMEM
residual) their cached entries so bench.py's canary suite gates them, and
re-stamps `measured_at`. Accelerator only; refuses to overwrite an artifact
for a different chip.

Usage: python -u benchmarks/refresh_mfu.py
"""
import json
import pathlib
import sys


def main():
    import jax

    from maus_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    if jax.default_backend() == "cpu":
        print(json.dumps({"metric": "mfu_refresh_skipped",
                          "reason": "cpu backend"}))
        return 0
    from benchmarks.mfu import calibrate_canary, scorecard

    sc = scorecard()
    # per-kernel run-to-run variance for bench.py's drift gates (VERDICT r4
    # #1): 3 full canary passes, each with a fresh overhead measurement,
    # exactly as bench invocations will measure them
    sc["canary_calibration"] = calibrate_canary(runs=3)
    path = pathlib.Path(__file__).parent / "mfu_v5e.json"
    if path.exists():
        old = json.loads(path.read_text())
        if old.get("device_kind") != sc["device_kind"]:
            print(json.dumps({"metric": "mfu_refresh_refused",
                              "reason": f"artifact is for "
                                        f"{old.get('device_kind')}, chip is "
                                        f"{sc['device_kind']}"}))
            return 1
    path.write_text(json.dumps(sc, indent=1) + "\n")
    print(json.dumps({"metric": "mfu_scorecard_refresh",
                      "measured_at": sc["measured_at"],
                      "git_sha": sc.get("git_sha"),
                      "canary_spread": {k: v["spread"] for k, v in
                                        sc["canary_calibration"].items()},
                      "kernels": sorted(sc["kernels"])}))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    sys.exit(main())
