"""Memory-pressure proof of the streaming claim: run the heavyweight
pipelines with the OBJECT STORE CAPPED far below the data size and assert
completion + correctness — spilling allowed, OOM not.

A 128 GiB single-node sandbox never stresses plasma; a 256-node cluster
pushing 100 TB does. Capping object_store_memory to a few GiB while
streaming millions of turns forces the executor into exactly the
backpressure/spill regime the scale claim depends on. Numbers land in
BASELINE.md.

Usage (fresh process — owns its own Ray session):
    python tools/stress_capped.py [--sf 1.6] [--cap-gib 2] [--cpus 32]
        [--docs-dir /root/testdata/sf0.1]
Prints one JSON line: {"cap_gib":..., "sf":..., "flagship_sec":...,
"roundtrip_ok":..., "fuzzy_sec":..., "glt_sec":..., ...}.
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.6)
    ap.add_argument("--cap-gib", type=float, default=2.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--docs-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/dev/shm/stress_capped")
    ap.add_argument("--skip-fuzzy", action="store_true")
    ap.add_argument("--skip-glt", action="store_true")
    args = ap.parse_args()

    import clp_core_ray  # noqa: F401  (malloc tuning before ray.init)
    from clp_core_ray import _export_tuning_env

    _export_tuning_env()
    import ray

    ray.init(address="local", num_cpus=args.cpus,
             object_store_memory=int(args.cap_gib * (1 << 30)),
             include_dashboard=False, log_to_driver=False)
    out = {"cap_gib": args.cap_gib, "sf": args.sf, "num_cpus": args.cpus}
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)
    try:
        from clp_core_ray.pipelines.compress import compress, roundtrip_check
        from clp_core_ray.sources.transcripts import n_turns_for_sf

        # flagship compress: full parse→enrich→route→sink under the cap
        arch = os.path.join(args.workdir, "arch")
        t0 = time.time()
        res = compress(args.sf, arch)
        out["flagship_sec"] = round(time.time() - t0, 3)
        n_expect = n_turns_for_sf(args.sf)
        import pyarrow.compute as pc

        n_rows = int(pc.sum(res.column("cnt")).as_py())  # per-class counts
        out["flagship_rows"] = n_rows
        out["flagship_rows_ok"] = bool(n_rows == n_expect)
        out["flagship_turns_per_sec"] = round(n_expect / out["flagship_sec"])

        # encode→decode per-turn equality, streaming under the same cap
        t0 = time.time()
        rt = roundtrip_check(args.sf)
        out["roundtrip_sec"] = round(time.time() - t0, 3)
        out["roundtrip_ok"] = bool(
            rt.column("n_turns")[0].as_py() == rt.column("n_ok")[0].as_py()
            == n_expect)

        if not args.skip_glt:
            from clp_core_ray.pipelines.glt import glt_search, write_glt
            from clp_core_ray.pipelines.search import search_count

            t0 = time.time()
            write_glt(arch)
            out["glt_sec"] = round(time.time() - t0, 3)
            q = "*timeout*"
            n_glt = glt_search(arch, q).count()
            n_std = search_count(arch, q).column("cnt")[0].as_py()
            out["glt_search_rows"] = int(n_glt)
            out["glt_ok"] = bool(n_glt == n_std and n_glt > 0)

        if not args.skip_fuzzy:
            from clp_core_ray.functions.dedup import fuzzy_dedup
            import ray.data as rd

            t0 = time.time()
            docs = rd.read_parquet(
                os.path.join(args.docs_dir, "documents.parquet"),
                columns=["doc_id", "text"])
            kept = fuzzy_dedup(docs).count()
            out["fuzzy_sec"] = round(time.time() - t0, 3)
            out["fuzzy_kept"] = int(kept)
            out["fuzzy_ok"] = bool(kept > 0)

        out["ok"] = all(v for k, v in out.items() if k.endswith("_ok"))
    finally:
        shutil.rmtree(args.workdir, ignore_errors=True)
        ray.shutdown()
    print(json.dumps(out))
    return 0 if out.get("ok") else 1


if __name__ == "__main__":
    raise SystemExit(main())
