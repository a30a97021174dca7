"""Benchmark: run the catalog's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"queries": {name: sec}, "metric": ..., "value": total_sec,
"unit": "sec", "sf": ..., "n_queries": N}. The raw repeat-run vectors
land in BENCH_LOCAL.json next to this file (stdout is tail-truncated by
the driver, so the line carries only the min-per-query map).

Each query is forced end-to-end with a noop sink (full materialization,
no driver collect / sink-format cost).

Noise resistance: this host is co-tenant (the same commit has measured
112.8 s and 150.7 s totals under different background load), so a single
measurement is not round-over-round comparable. Every query runs twice,
sub-second queries a third time, and ``queries`` carries the MIN — the
standard co-tenancy-robust statistic (background load only ever adds
time). The raw runs are emitted under ``queries_runs`` so the spread
itself is inspectable. ``SPARK_GRAFT_BENCH_RUNS=1`` restores the old
single-pass behavior for quick local iteration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # The driver parses stdout as JSON, so stdout must carry EXACTLY one
    # line. The JVM child process inherits fd 1 and writes startup noise
    # (log-level banner, Ivy resolution) there — redirect fd 1 to stderr
    # at the OS level for the whole run, then restore it for the final
    # print. Python-level sys.stdout swaps can't catch child-process
    # writes; dup2 does.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    try:
        timings, runs_all, errors, sf_val, requeued = _run()
    finally:
        sys.stdout.flush()
        os.dup2(real_stdout, 1)
        os.close(real_stdout)
    total = round(sum(t for t in timings.values() if t is not None), 3)
    # stdout carries ONE line and the driver retains only its TAIL
    # (round 5: 148 of 196 timings were truncated away). Two levers:
    # (a) the bulky raw-runs map goes to a side file, not stdout, which
    # roughly halves the line; (b) ``queries`` comes FIRST and the
    # scalar summary fields LAST, so whatever prefix the truncation
    # eats, the retained tail always ends with the complete
    # metric/value/sf summary plus the maximal suffix of per-query
    # timings.
    payload = {
        "queries": timings,
        "metric": "catalog_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
    }
    if errors:
        payload["errors"] = errors
    if requeued:
        payload["requeued"] = requeued
    full = dict(payload)
    full["queries_runs"] = runs_all
    if _SPLIT_TIMINGS:
        full["split_timings"] = _SPLIT_TIMINGS
    try:
        side = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
        )
        with open(side, "w") as fh:
            json.dump(full, fh, separators=(",", ":"))
    except OSError:
        pass  # side artifact is best-effort; stdout is the contract
    print(json.dumps(payload, separators=(",", ":")), flush=True)


def _run() -> tuple[
    dict[str, float | None],
    dict[str, list[float]],
    dict[str, str],
    float | str,
    list[str],
]:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from slipstream_async_spark.plans.catalog import queries
    from slipstream_async_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM once so per-query numbers measure the plan, not
    # first-touch overheads: a real scan + shuffle + codegen compile
    # (count() alone is footer-only and leaves all of that cold).
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # Warm the Arrow Python-worker lane too (r10: mm_decode_features —
    # the pass's first mapInArrow query — was requeued as an
    # interference suspect because its FIRST run carried the python
    # worker spawn + Arrow IPC setup, tripping the >3x run-spread
    # heuristic). One tiny round trip pays that once, outside any
    # query's measurement.
    try:
        import pyarrow  # noqa: F401

        spark.range(8).toPandas()
        df1 = spark.range(8)
        df1.mapInArrow(lambda it: it, df1.schema).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:  # noqa: BLE001 — warmup is best-effort
        pass

    # Per-query fault isolation: one broken plan must not zero out the
    # other ~100 measurements (round-2 lesson — a single plan-time
    # AnalysisException aborted the whole run with rc=1 and no timings).
    import gc

    # Repeat policy: >=2 runs per query, a 3rd when the running min is
    # sub-second (where co-tenancy jitter is proportionally worst); the
    # reported number is the min. SPARK_GRAFT_BENCH_RUNS=1 forces the
    # old single-pass for quick iteration; higher values raise the cap.
    max_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    base_runs = min(2, max_runs)

    timings: dict[str, float | None] = {}
    runs_all: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for i, (name, fn) in enumerate(queries().items()):
        runs: list[float] = []
        try:
            for r in range(max_runs):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
                # Cache/broadcast leaks would otherwise accrue across
                # 100+ measurements and tax later queries with
                # multi-second GC debt (measured): cache() holds STRONG
                # refs in the CacheManager; localCheckpoint blocks stay
                # pinned by live py4j refs. Clear between runs too, so
                # every repeat measures the same cold-cache work.
                spark.catalog.clearCache()
                gc.collect()
                if r + 1 >= base_runs and min(runs) >= 1.0:
                    break
            timings[name] = min(runs)
            runs_all[name] = runs
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            # Per-query fault isolation (round-2 lesson: one plan-time
            # AnalysisException zeroed out the whole run). A repeat-run
            # failure after a good first run still yields that min.
            timings[name] = min(runs) if runs else None
            runs_all[name] = runs
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            spark.catalog.clearCache()
            gc.collect()
        if (i + 1) % 10 == 0:
            spark.sparkContext._jvm.System.gc()

    # Interference re-queue (round-6 lesson: the driver's bench window
    # sat inside one multi-minute co-tenant load burst, recording a
    # 2.0 s query at 33.5 s min-of-2 — min-of-N does not survive a
    # burst that covers all N runs). A query is suspect when its own
    # run vector spreads >3x, or its min exceeds 3x (+1 s absolute,
    # so sub-second jitter never triggers) the committed quiet-run
    # value in BENCH_QUIET.json — a READ-ONLY baseline this script
    # never writes, unlike BENCH_LOCAL.json which every run (including
    # the driver's loaded one) overwrites. Suspects re-run ONCE at the
    # very end of the pass — maximally far from the burst that
    # inflated them — and the reported min is over all runs.
    quiet: dict[str, float] = {}
    try:
        qpath = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_QUIET.json"
        )
        with open(qpath) as fh:
            qdoc = json.load(fh)
        if qdoc.get("sf") == _sf_of(sf_dir):
            quiet = {
                k: v
                for k, v in (qdoc.get("queries") or {}).items()
                if isinstance(v, (int, float))
            }
    except (OSError, ValueError):
        pass

    def _suspect(name: str) -> bool:
        runs = runs_all.get(name) or []
        if not runs or timings.get(name) is None:
            return False
        if max(runs) > 3.0 * min(runs) and max(runs) - min(runs) > 1.0:
            return True
        ref = quiet.get(name)
        return (
            ref is not None
            and ref > 0
            and min(runs) > 3.0 * ref
            and min(runs) - ref > 1.0
        )

    suspects = [n for n in timings if _suspect(n)]
    if suspects:
        print(
            f"bench: re-queueing {len(suspects)} interference suspects: "
            f"{suspects}",
            file=sys.stderr,
        )
    fns = queries()
    for name in suspects:
        try:
            t0 = time.time()
            fns[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
            runs_all[name].append(dt)
            timings[name] = min(timings[name], dt)
            spark.catalog.clearCache()
            gc.collect()
        except Exception as exc:  # noqa: BLE001
            # A transient requeue failure must not mark a query that
            # already holds a valid main-pass min as errored (r7 advice)
            # — the requeue exists to IMPROVE timings, never to revoke
            # them. Only record when the query has no timing at all.
            if timings.get(name) is None and name not in errors:
                errors[name] = (
                    f"requeue {type(exc).__name__}: {exc}"[:300]
                )
            else:
                print(
                    f"bench: requeue of {name} failed (keeping main-pass "
                    f"min): {exc}",
                    file=sys.stderr,
                )

    # Build-vs-probe split for the materialized-index lanes (r7 lesson:
    # sim_topk_ivf_indexed's single number times a full index REBUILD +
    # probe, so it moved 2.98->4.65 s with no lane change and invited
    # optimizing the wrong half). The driver-contract number stays the
    # full rebuild+probe; the sidecar records the split so regressions
    # attribute to the right phase.
    global _SPLIT_TIMINGS
    _SPLIT_TIMINGS = {}
    try:
        import shutil
        import tempfile

        from slipstream_async_spark.operators import similarity as SIM
        from slipstream_async_spark.sources.readers import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        idx = tempfile.mkdtemp(prefix="bench_ivf_split_")
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        SIM.ivf_index_write(emb, idx, n_lists=16)
        build = round(time.time() - t0, 3)
        t0 = time.time()
        SIM.ivf_topk(None, q, k=5, n_probe=4, index_path=idx).write.format(
            "noop"
        ).mode("overwrite").save()
        probe = round(time.time() - t0, 3)
        _SPLIT_TIMINGS["sim_topk_ivf_indexed"] = {
            "build": build, "probe": probe,
        }
        shutil.rmtree(idx, ignore_errors=True)
    except Exception as exc:  # noqa: BLE001 — sidecar-only, best-effort
        print(f"bench: split timing failed: {exc}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    return timings, runs_all, errors, sf_val, suspects


_SPLIT_TIMINGS: dict[str, dict[str, float]] = {}


def _sf_of(sf_dir: str) -> float | str:
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(sf)
    except ValueError:
        return sf


if __name__ == "__main__":
    main()
