"""Repo-level fork detection (operators/forks.py): planted forks vs a
brute-force set-Jaccard oracle, cluster collapse, null handling."""

import itertools

import pytest

from searchengine_spark.operators.forks import (
    collapse_forks,
    fork_clusters,
    fork_pairs,
)

# repoA: 12 distinct blobs; repoDup: exact copy (J=1); repoFork: 11 of
# 12 (J=11/13... computed below); repoHalf: 6 of 12 (below threshold);
# repoOther: disjoint
_BLOBS = {f"blob-{i}": f"content of file number {i} lorem ipsum" for i in range(12)}


def _rows():
    rows = []
    for path, text in _BLOBS.items():
        rows.append(("repoA", path, text))
        rows.append(("repoDup", path, text))
    for i, (path, text) in enumerate(_BLOBS.items()):
        if i != 0:
            rows.append(("repoFork", f"moved/{path}", text))
        if i % 2 == 0:
            rows.append(("repoHalf", path, text))
    rows.append(("repoOther", "x.py", "entirely different content"))
    rows.append(("repoNull", "broken.bin", None))
    return rows


def _table(spark):
    return spark.createDataFrame(
        [(r, p, "c0", "py", t) for r, p, t in _rows()],
        "repo string, path string, commit string, lang string, content string",
    )


def _brute_pairs(threshold):
    sets = {}
    for r, _, t in _rows():
        if t is not None:
            sets.setdefault(r, set()).add(t)
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= threshold:
            out[(a, b)] = round(j, 9)
    return out


def test_fork_pairs_match_brute_force(spark):
    got = {
        (r["repo_a"], r["repo_b"]): r["jaccard"]
        for r in fork_pairs(_table(spark)).collect()
    }
    want = _brute_pairs(0.7)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k
    # sanity on the planted geometry itself
    assert want[("repoA", "repoDup")] == 1.0
    assert want[("repoA", "repoFork")] == pytest.approx(11 / 12)
    assert ("repoA", "repoHalf") not in want  # 6/12 = 0.5 < 0.7


def test_fork_clusters_and_collapse(spark):
    t = _table(spark)
    labels = {
        r["repo"]: r["canonical_repo"] for r in fork_clusters(t).collect()
    }
    assert labels["repoA"] == "repoA"
    assert labels["repoDup"] == "repoA"
    assert labels["repoFork"] == "repoA"
    # below-threshold and disjoint repos are their own clusters
    assert labels["repoHalf"] == "repoHalf"
    assert labels["repoOther"] == "repoOther"

    kept = collapse_forks(t)
    kept_repos = {r["repo"] for r in kept.select("repo").distinct().collect()}
    assert kept_repos == {"repoA", "repoHalf", "repoOther", "repoNull"}
    # the canonical repo keeps ALL its rows
    assert kept.filter("repo = 'repoA'").count() == 12


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_fork_clusters_match_brute_force_union_find(spark, seed):
    """Randomized tables (overlapping blob pools, planted copies,
    empty-ish repos): fork_clusters labels must equal a brute-force
    union-find over the exact >=threshold Jaccard graph. The LSH layer
    is deterministic, and at r=2/8 bands the miss probability at
    J>=0.7 is ~0.4% per pair — across these seeds the exact graph and
    the engine agree, so any label drift is a real defect."""
    import random

    rng = random.Random(seed)
    pool = [f"blob content {i}" for i in range(30)]
    rows, sets = [], {}
    for ri in range(10):
        repo = f"repo{ri:02d}"
        if ri >= 7:  # planted near-copies of earlier repos
            src = sorted(sets[f"repo{ri - 7:02d}"])
            blobs = [b for b in src if rng.random() > 0.08]
        else:
            blobs = rng.sample(pool, rng.randint(2, 12))
        sets[repo] = set(blobs)
        for j, b in enumerate(blobs):
            rows.append((repo, f"f{j}", b))
    t = spark.createDataFrame(
        [(r, p, "c", "py", b) for r, p, b in rows],
        "repo string, path string, commit string, lang string, content string",
    )

    # brute force: exact jaccard graph -> union-find -> min label
    parent = {r: r for r in sets}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= 0.7:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for r in sets:
        root = find(r)
        members = [x for x in sets if find(x) == root]
        want[r] = min(members)

    got = {r["repo"]: r["canonical_repo"] for r in fork_clusters(t).collect()}
    assert got == want, seed


def test_collapse_forks_passes_null_repo_rows_through(spark):
    rows = _rows() + [(None, "orphan.py", "ownerless row")]
    t = spark.createDataFrame(
        [(r, p, "c0", "py", x) for r, p, x in rows],
        "repo string, path string, commit string, lang string, content string",
    )
    kept = collapse_forks(t)
    assert kept.filter("repo IS NULL").count() == 1
    kept_repos = {
        r["repo"] for r in kept.filter("repo IS NOT NULL")
        .select("repo").distinct().collect()
    }
    assert kept_repos == {"repoA", "repoHalf", "repoOther", "repoNull"}


def test_fork_pairs_bands_must_divide_k(spark):
    with pytest.raises(ValueError):
        fork_pairs(_table(spark), k=16, bands=5)
    with pytest.raises(ValueError):
        fork_clusters(_table(spark), k=16, bands=5)


def test_identical_fork_family_collapses_before_lsh(spark):
    """An identical-fork family (same blob set under m repo names) is
    united by star edges to its min-name representative, and clusters
    are label-identical to the all-pairs graph: the near-fork of the
    family joins the SAME cluster through the representative."""
    rows = []
    blobs = [f"text body {i}" for i in range(10)]
    for m in range(6):  # fam0..fam5: identical copies
        for i, t in enumerate(blobs):
            rows.append((f"fam{m}", f"p{i}", t))
    for i, t in enumerate(blobs):  # near fork of the family (9/10)
        if i:
            rows.append(("nearfam", f"q{i}", t))
    rows.append(("loner", "x", "unrelated content"))
    t = spark.createDataFrame(
        [(r, p, "c", "py", x) for r, p, x in rows],
        "repo string, path string, commit string, lang string, content string",
    )
    labels = {r["repo"]: r["canonical_repo"] for r in fork_clusters(t).collect()}
    assert labels == {
        **{f"fam{m}": "fam0" for m in range(6)},
        "nearfam": "fam0",
        "loner": "loner",
    }

    from searchengine_spark.operators.forks import exact_repo_groups, repo_file_shas

    groups = {
        r["repo"]: r["rep_repo"]
        for r in exact_repo_groups(repo_file_shas(t)).collect()
    }
    assert groups == {
        **{f"fam{m}": "fam0" for m in range(6)},
        "nearfam": "nearfam",
        "loner": "loner",
    }
