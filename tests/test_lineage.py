"""Resumable partitioned output: atomic writes, manifest skip-on-resume,
per-partition metrics (SURVEY.md §4 'Straggler/retry/checkpoint/resume')."""

import json
import os
import shutil

import pytest


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _points_ds(corpus):
    import ray.data

    return ray.data.read_parquet(f"{corpus}/points.parquet")


def test_write_then_resume_skips_done(ray_session, corpus, out_dir):
    from oscar_spatial_index_compare_ray.state.lineage import (
        load_manifest,
        read_resumable,
        write_resumable,
    )

    s1 = write_resumable(_points_ds(corpus), out_dir, num_shards=8,
                         lineage={"input": corpus, "op": "points"})
    assert s1["written_shards"] == 8 and s1["skipped_shards"] == 0

    # resume: nothing left to do, no partitions rewritten
    mtimes = {
        p: os.path.getmtime(os.path.join(out_dir, p, "data.parquet"))
        for p in os.listdir(out_dir) if p.startswith("part=")
    }
    s2 = write_resumable(_points_ds(corpus), out_dir, num_shards=8)
    assert s2["written_shards"] == 0 and s2["skipped_shards"] == 8
    for p, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, p, "data.parquet")) == t

    # round trip: all rows come back
    n_in = _points_ds(corpus).count()
    assert read_resumable(out_dir).count() == n_in

    # manifest carries metrics + lineage
    entries = load_manifest(out_dir)
    assert len(entries) == 8
    e = next(iter(entries.values()))
    assert e["rows"] > 0 and e["bytes"] > 0 and e["lineage"]["op"] == "points"


def test_partial_failure_resume(ray_session, corpus, out_dir):
    """Simulate a crash: drop 3 shards from the manifest + disk, rerun —
    only those 3 are rewritten and the data completes."""
    from oscar_spatial_index_compare_ray.state.lineage import (
        load_manifest,
        read_resumable,
        write_resumable,
    )

    write_resumable(_points_ds(corpus), out_dir, num_shards=8)
    manifest = load_manifest(out_dir)
    victims = sorted(manifest)[:3]
    keep = [json.dumps(manifest[s]) for s in sorted(manifest) if s not in victims]
    with open(os.path.join(out_dir, "MANIFEST.jsonl"), "w") as f:
        f.write("\n".join(keep) + "\n")
    for s in victims:
        shutil.rmtree(os.path.join(out_dir, f"part={s:05d}"))

    s = write_resumable(_points_ds(corpus), out_dir, num_shards=8)
    assert s["written_shards"] == 3 and s["skipped_shards"] == 5
    assert read_resumable(out_dir).count() == _points_ds(corpus).count()


def test_deterministic_sharding(ray_session, corpus, out_dir):
    """Same key → same shard regardless of order/parallelism."""
    from oscar_spatial_index_compare_ray.state.lineage import add_shard_column

    ds = _points_ds(corpus)
    a = add_shard_column(ds, "doc_id", 16).select_columns(["doc_id", "shard"]).take_all()
    b = add_shard_column(ds.repartition(7), "doc_id", 16).select_columns(["doc_id", "shard"]).take_all()
    ma = {(r["doc_id"], r["shard"]) for r in a}
    mb = {(r["doc_id"], r["shard"]) for r in b}
    assert ma == mb
