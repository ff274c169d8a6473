"""Scale evidence for the dedup/ANN family (round-5 verdict ask #1).

Runs the minhash→star-edges→connected-components chain, the 13-gram
contamination check, and the banded-LSH near-dup candidate join at
1x / 4x / 10x the sf0.1 input (replicas with deterministic id offsets
and per-replica text/vector perturbation so LSH buckets keep their
natural spread), reporting wall seconds AND shuffle read/write bytes
per block (from the Spark status REST API, summed over the block's
jobs via job-group tagging).

The point is the growth CURVE, not absolute seconds: all blocks of one
run share a session and a host window, so near-linear growth in rows ⇒
near-linear wall/shuffle growth is host-independent evidence.

Usage: python bench_scale.py [scales...]   (default 1 4 10)
Prints one JSON line; not part of the frozen bench.py contract.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from scrapy_rs_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _rest(spark, path):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _shuffle_bytes(spark, group: str) -> dict:
    jobs = [j for j in _rest(spark, "/jobs") if j.get("jobGroup") == group]
    stage_ids = {s for j in jobs for s in j["stageIds"]}
    rd = wr = 0
    for s in _rest(spark, "/stages"):
        if s["stageId"] in stage_ids and s["status"] == "COMPLETE":
            rd += s.get("shuffleReadBytes", 0)
            wr += s.get("shuffleWriteBytes", 0)
    return {"shuffle_read_mb": round(rd / 1e6, 1),
            "shuffle_write_mb": round(wr / 1e6, 1)}


def _timed(spark, group, df):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    t0 = time.time()
    n = df.count()
    dt = round(time.time() - t0, 2)
    sc.setJobGroup(None, None)
    out = {"rows": n, "seconds": dt}
    try:
        out.update(_shuffle_bytes(spark, group))
    except Exception as e:
        out["shuffle_err"] = str(e)[:80]
    return out


def scaled_docs(spark, k: int):
    """k replicas of sf0.1 documents: ids offset by 10^7 per replica,
    text perturbed with a per-replica suffix word so replica shingles
    do not all collide into the originals' LSH buckets (which would be
    an adversarial hot-bucket test, not a scale test)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = []
    for i in range(k):
        d = docs
        if i:
            d = docs.select(
                (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(f" replica{i} salt{i * 7919}")
                ).alias("text"),
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_vecs(spark, k: int):
    """k replicas of sf0.1 embeddings with a small deterministic
    per-replica, per-dimension perturbation (keeps SRP buckets spread
    naturally instead of stacking exact duplicates into one bucket)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    parts = []
    for i in range(k):
        v = emb
        if i:
            v = emb.select(
                (F.col("vec_id") + 10_000_000 * i).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: x
                    + (
                        F.pmod(j * 31 + F.lit(i * 17), F.lit(7)).cast(
                            "float"
                        )
                        - F.lit(3.0)
                    )
                    * F.lit(0.01),
                ).alias("embedding"),
            )
        parts.append(v)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = build_session(
        app_name="bench_scale",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    from scrapy_rs_spark.operators.similarity import lsh_band_candidates
    from scrapy_rs_spark.operators.textdedup import (
        contamination_check,
        dedup_clusters,
        lsh_star_edges,
        minhash_signatures,
    )

    result: dict = {"sf_dir": SF_DIR, "scales": {}}
    # warmup (codegen + python workers)
    minhash_signatures(scaled_docs(spark, 1), bands=8).count()
    for k in scales:
        docs = scaled_docs(spark, k).localCheckpoint(eager=True)
        n_docs = docs.count()
        blk: dict = {"docs": n_docs}

        sigs = minhash_signatures(docs, bands=8)
        blk["minhash"] = _timed(spark, f"minhash_x{k}", sigs)

        edges = lsh_star_edges(minhash_signatures(docs, bands=8))
        blk["star_edges"] = _timed(spark, f"star_x{k}", edges)

        t0 = time.time()
        spark.sparkContext.setJobGroup(f"cc_x{k}", f"cc_x{k}")
        clusters = dedup_clusters(
            lsh_star_edges(minhash_signatures(docs, bands=8))
        )
        n_cl = clusters.count()
        spark.sparkContext.setJobGroup(None, None)
        blk["dedup_clusters"] = {
            "rows": n_cl,
            "seconds": round(time.time() - t0, 2),
        }
        try:
            blk["dedup_clusters"].update(_shuffle_bytes(spark, f"cc_x{k}"))
        except Exception:
            pass

        bench = docs.filter(F.col("doc_id") % 97 == 0)
        blk["contamination"] = _timed(
            spark,
            f"contam_x{k}",
            contamination_check(docs, bench, n=13),
        )

        vecs = scaled_vecs(spark, k).localCheckpoint(eager=True)
        blk["vectors"] = vecs.count()
        blk["lsh_band_candidates"] = _timed(
            spark,
            f"band_x{k}",
            lsh_band_candidates(vecs, 8, 8).select("id_a", "id_b"),
        )
        result["scales"][f"x{k}"] = blk
        docs.unpersist()
        vecs.unpersist()
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
