"""Fixture determinism + oracle sanity (SURVEY.md §5 items 1-3).

The oracle here IS the parity target (stand-in for the C++ reference at
the same shingle/signature config); these tests check it recovers the
planted structure and reproduces the reference's classification rules.
"""

import numpy as np
import pandas as pd
import pytest

from mfdedup_spark import oracle
from mfdedup_spark.config import SignatureConfig
from mfdedup_spark.core import codecs
from mfdedup_spark.fixtures import generate_images, generate_versioned

CFG = SignatureConfig()


@pytest.fixture(scope="module")
def images():
    return generate_images(n_images=200, seed=42)


@pytest.fixture(scope="module")
def sigs(images):
    df, _ = images
    return oracle.compute_signatures(df, CFG)


def test_fixture_deterministic():
    a, _ = generate_images(60, seed=42)
    b, _ = generate_images(60, seed=42)
    assert a["image_id"].tolist() == b["image_id"].tolist()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    assert a["phash"].tolist() == b["phash"].tolist()


def test_fixture_schema(images):
    df, truth = images
    assert list(df.columns) == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "version", "seq_no",
    ]
    assert len(df) == 200
    assert len(truth.exact_pairs) > 0 and len(truth.near_pairs) > 0
    assert len(truth.caption_pairs) > 0 and len(truth.hot_ids) > 0
    # lossy invariant: every row's decode is within PSNR 40 of itself (trivially)
    r = df.iloc[0]
    px = codecs.decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
    assert px.shape == (r["h"], r["w"])


def test_oracle_finds_exact_dups(images, sigs):
    df, truth = images
    cand = oracle.candidate_pairs(sigs, CFG)
    pairs = oracle.verify_pairs(sigs, cand, CFG)
    got = set(zip(pairs["image_id_a"], pairs["image_id_b"]))
    clusters = oracle.connected_components(pairs, df["image_id"].tolist())
    # every planted exact pair ends up in the same cluster
    for a, b in truth.exact_pairs:
        assert clusters[a] == clusters[b], (a, b)
    sha1_pairs = pairs[pairs["method"] == "sha1"]
    assert len(sha1_pairs) >= 1


def test_oracle_near_dup_recall(images, sigs):
    df, truth = images
    cand = oracle.candidate_pairs(sigs, CFG)
    pairs = oracle.verify_pairs(sigs, cand, CFG)
    clusters = oracle.connected_components(pairs, df["image_id"].tolist())
    hit = sum(1 for a, b in truth.near_pairs if clusters[a] == clusters[b])
    recall = hit / len(truth.near_pairs)
    assert recall >= 0.9, f"near-dup recall {recall}"


def test_oracle_caption_pairs(images):
    df, truth = images
    cp = oracle.caption_pairs(df, CFG)
    got = set(zip(cp["image_id_a"], cp["image_id_b"]))
    for a, b in truth.caption_pairs:
        assert (a, b) in got or (b, a) in got, (a, b)


def test_oracle_hot_bucket_cluster(images, sigs):
    df, truth = images
    cand = oracle.candidate_pairs(sigs, CFG)
    pairs = oracle.verify_pairs(sigs, cand, CFG)
    clusters = oracle.connected_components(pairs, df["image_id"].tolist())
    hot_clusters = {clusters[i] for i in truth.hot_ids}
    assert len(hot_clusters) <= 2  # near-constant images collapse together


def test_classification_reference_semantics():
    df = generate_versioned(n_images=80, versions=3, seed=42)
    cl = oracle.classify_versions(df)
    v1 = cl[cl["version"] == 1]
    assert set(v1["result"]) == {"UNIQUE"}  # first version is all-new
    v2 = cl[cl["version"] == 2]
    counts = v2["result"].value_counts()
    assert counts.get("ADJACENT", 0) > 0
    assert counts.get("INTERNAL", 0) > 0
    assert counts.get("UNIQUE", 0) > 0
    # laterTable-first precedence: a fp carried from v1 AND repeated in v2
    # must be ADJACENT on first occurrence, INTERNAL after
    for fp, g in v2.sort_values("seq_no").groupby("fp"):
        res = g["result"].tolist()
        assert all(r == "INTERNAL" for r in res[1:])


def test_metrics_ratio():
    df = generate_versioned(n_images=60, versions=2, seed=42)
    cl = oracle.classify_versions(df)
    m = oracle.metrics(df, cl)
    assert (m["total_len"] >= m["unique_len"]).all()
    row = m[m["version"] == 2].iloc[0]
    assert row["dedup_ratio"] > 1.0
    assert row["n_unique"] + row["n_internal"] + row["n_adjacent"] == (
        (cl["version"] == 2).sum()
    )


def test_category_id_formula():
    # /root/reference/README.md:51-57: new-chunk category of version v
    # is v(v+1)/2 (= category (v, v))
    assert oracle.category_id(1, 1) == 1
    assert oracle.category_id(2, 2) == 3
    assert oracle.category_id(2, 1) == 2
    assert oracle.category_id(3, 3) == 6
    for v in range(1, 10):
        assert oracle.category_id(v, v) == v * (v + 1) // 2


def test_avar_split():
    df = generate_versioned(n_images=60, versions=2, seed=42)
    cl = oracle.classify_versions(df)
    active, archived = oracle.avar_split(cl, 2)
    v1_fps = set(cl.loc[cl["version"] == 1, "fp"])
    assert active | archived == v1_fps
    assert active & archived == set()
    assert len(active) > 0 and len(archived) > 0
