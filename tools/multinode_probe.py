"""Multi-process Ray CLUSTER probe (round-5 stretch): start a real head +
worker node (two raylets, two plasma stores), run the flagship pipeline
against the cluster, and assert correctness — exercising actual cross-node
object transfer instead of single-raylet local mode.

Usage (owns the cluster lifecycle; prints one JSON line):
    python tools/multinode_probe.py [--sf 0.4] [--cpus-per-node 8]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 6380


def _sh(cmd: list[str]) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, timeout=120)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.4)
    ap.add_argument("--cpus-per-node", type=int, default=8)
    ap.add_argument("--workdir", default="/dev/shm/multinode_probe")
    args = ap.parse_args()

    import clp_core_ray  # noqa: F401
    from clp_core_ray import _export_tuning_env

    _export_tuning_env()
    os.environ.pop("RAY_ADDRESS", None)  # the preset 'local' must not win
    ray_bin = shutil.which("ray") or sys.executable.replace(
        "python", "ray")

    out: dict = {"sf": args.sf, "cpus_per_node": args.cpus_per_node}
    _sh([ray_bin, "stop", "--force"])
    head = _sh([ray_bin, "start", "--head", f"--port={PORT}",
                f"--num-cpus={args.cpus_per_node}",
                "--include-dashboard=false",
                "--object-store-memory", str(2 << 30)])
    if head.returncode != 0:
        print(json.dumps({"ok": False, "error": head.stderr[-500:]}))
        return 1
    worker = _sh([ray_bin, "start", f"--address=127.0.0.1:{PORT}",
                  f"--num-cpus={args.cpus_per_node}",
                  "--object-store-memory", str(2 << 30)])
    out["worker_started"] = worker.returncode == 0

    import ray

    try:
        ray.init(address=f"127.0.0.1:{PORT}", include_dashboard=False,
                 log_to_driver=False)
        nodes = [n for n in ray.nodes() if n["Alive"]]
        out["nodes"] = len(nodes)
        out["total_cpus"] = int(ray.cluster_resources().get("CPU", 0))

        from clp_core_ray.pipelines.compress import compress
        from clp_core_ray.pipelines.search import search_count
        from clp_core_ray.sources.transcripts import n_turns_for_sf

        shutil.rmtree(args.workdir, ignore_errors=True)
        arch = os.path.join(args.workdir, "arch")
        t0 = time.time()
        res = compress(args.sf, arch)
        out["flagship_sec"] = round(time.time() - t0, 3)
        import pyarrow.compute as pc

        n_rows = int(pc.sum(res.column("cnt")).as_py())
        n_expect = n_turns_for_sf(args.sf)
        out["flagship_rows"] = n_rows
        out["rows_ok"] = bool(n_rows == n_expect)
        out["turns_per_sec"] = round(n_expect / out["flagship_sec"])
        n = search_count(arch, "*timeout*").column("cnt")[0].as_py()
        out["search_rows"] = int(n)
        out["search_ok"] = bool(n > 0)
        out["ok"] = bool(out["nodes"] >= 2 and out["rows_ok"]
                         and out["search_ok"])
    except Exception as e:  # noqa: BLE001
        out["ok"] = False
        out["error"] = repr(e)[:500]
    finally:
        try:
            ray.shutdown()
        except Exception:
            pass
        shutil.rmtree(args.workdir, ignore_errors=True)
        _sh([ray_bin, "stop", "--force"])
    print(json.dumps(out))
    return 0 if out.get("ok") else 1


if __name__ == "__main__":
    raise SystemExit(main())
