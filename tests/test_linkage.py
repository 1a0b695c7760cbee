"""Fuzzy linkage / entity resolution (tabbyray/ops/linkage.py):
the symmetric-deletion blocking recall guarantee, banded byte-DP
parity, and end-to-end cluster semantics on the deterministic
fuzzy-linkage fixture."""

import pandas as pd
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from tabbyray.ops.linkage import byte_lev_within, deletion_keys


def _naive_lev(a: bytes, b: bytes) -> int:
    prev = list(range(len(a) + 1))
    for j in range(1, len(b) + 1):
        cur = [j]
        for i in range(1, len(a) + 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1,
                           prev[i - 1] + (a[i - 1] != b[j - 1])))
        prev = cur
    return prev[len(a)]


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=12), st.binary(min_size=0, max_size=12),
       st.integers(min_value=0, max_value=3))
def test_banded_lev_matches_naive(a, b, k):
    d = _naive_lev(a, b)
    got = byte_lev_within(a, b, k)
    assert got == (d if d <= k else k + 1)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abc", min_size=1, max_size=8),
       st.text(alphabet="abc", min_size=1, max_size=8))
def test_deletion_blocking_perfect_recall_d1(a, b):
    """SymSpell's core property: byte-lev(a, b) <= 1 implies the
    depth-1 deletion neighborhoods intersect — the key join can never
    lose a true pair."""
    ab, bb = a.encode(), b.encode()
    if _naive_lev(ab, bb) <= 1:
        assert deletion_keys(ab, 1) & deletion_keys(bb, 1)


def test_deletion_keys_shapes():
    # the empty key is load-bearing: "a" and "b" meet only at b""
    assert deletion_keys(b"a", 1) == {b"a", b""}
    assert deletion_keys(b"ab", 2) == {b"ab", b"a", b"b", b""}
    assert deletion_keys(b"ab", 1) == {b"ab", b"a", b"b"}


@pytest.fixture(scope="module")
def linkage_fix(ray_session):
    from tabbyray.fixtures import ensure_fuzzy_linkage_fixture
    fix = ensure_fuzzy_linkage_fixture()
    mentions = rd.read_parquet(fix + "/mentions.parquet",
                               override_num_blocks=4)
    labels = rd.read_parquet(fix + "/labels.parquet",
                             override_num_blocks=2)
    return fix, mentions, labels


def test_fuzzy_match_against_bruteforce(linkage_fix):
    """Blocked plan == unblocked brute force on the fixture (recall
    proof at the operator level, not just the key property)."""
    from tabbyray.normalize import normalize_entry
    from tabbyray.ops.linkage import fuzzy_label_match
    fix, mentions, labels = linkage_fix
    got = (fuzzy_label_match(mentions, labels, num_partitions=8)
           .to_pandas()
           .sort_values(["mention_id", "entity"]).reset_index(drop=True))

    mdf = pd.read_parquet(fix + "/mentions.parquet")
    ldf = pd.read_parquet(fix + "/labels.parquet")
    mdf["mnorm"] = mdf["surface"].map(normalize_entry)
    ldf["lnorm"] = ldf["label"].map(normalize_entry)
    mdf = mdf[mdf.mnorm != ""]
    ldf = ldf[ldf.lnorm != ""].drop_duplicates(["entity", "lnorm"])
    rows = []
    for _, m in mdf.iterrows():
        for _, l in ldf.iterrows():
            d = byte_lev_within(m.mnorm.encode(), l.lnorm.encode(), 1)
            if d <= 1:
                rows.append((m.mention_id, m.mnorm, l.entity, l.lnorm, d))
    exp = (pd.DataFrame(rows, columns=["mention_id", "mnorm", "entity",
                                       "lnorm", "dist"])
           .sort_values(["mention_id", "entity", "dist", "lnorm"])
           .drop_duplicates(["mention_id", "entity"])
           .sort_values(["mention_id", "entity"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_entity_resolution_clusters(linkage_fix):
    """Planted shapes come out: distance-1 pairs and 3-chains merge to
    the min entity (chains only via transitivity), the all-''-label
    ghost entity is absent, and every entity maps to exactly one
    canonical <= itself."""
    from tabbyray.ops.linkage import entity_resolution
    fix, _, labels = linkage_fix
    got = entity_resolution(labels, num_partitions=8).to_pandas()

    assert got.entity.is_unique
    assert (got.canonical <= got.entity).all()
    assert not got.entity.str.endswith("_ghost").any()

    canon = dict(zip(got.entity, got.canonical))
    ldf = pd.read_parquet(fix + "/labels.parquet")
    # planted twins/chains land in the SAME cluster as their base
    # (the canonical may be an even smaller entity when two bases are
    # themselves within distance 1 — e.g. 'Iron Point64'/'Iron
    # Point66' — so membership, not identity, is the invariant)
    for e in ldf.entity:
        if e.endswith("_v2") or e.endswith("_v3"):
            base = e.rsplit("_v", 1)[0]
            assert canon[e] == canon[base], e
            assert canon[e] <= base
    # distance-0 twin: sib_X shares a norm with X -> same cluster
    sibs = [e for e in ldf.entity if "/sib_" in e]
    assert sibs
    for s in sibs:
        base = s.replace("sib_", "")
        assert canon[s] == canon[base]


def test_fuzzy_match_top1_deterministic(linkage_fix):
    """dist asc then entity asc; one row per matched mention."""
    from tabbyray.ops.linkage import fuzzy_label_match, fuzzy_match_top1
    _, mentions, labels = linkage_fix
    matches = fuzzy_label_match(mentions, labels, num_partitions=8)
    all_m = matches.to_pandas()
    top1 = fuzzy_match_top1(matches, num_partitions=8).to_pandas()
    assert top1.mention_id.is_unique
    assert set(top1.mention_id) == set(all_m.mention_id)
    exp = (all_m.sort_values(["mention_id", "dist", "entity"])
           .drop_duplicates("mention_id"))
    merged = top1.merge(exp, on="mention_id", suffixes=("_g", "_e"))
    assert (merged.entity_g == merged.entity_e).all()
    assert (merged.dist_g == merged.dist_e).all()


def test_entity_resolution_raw_labels(ray_session):
    """normalize=False matches on raw bytes: case difference is a
    real edit, and punctuation is NOT stripped."""
    import ray.data as rd
    from tabbyray.ops.linkage import entity_resolution

    df = pd.DataFrame({
        "entity": ["e1", "e2", "e3", "e4", "e5"],
        "label": ["Node", "Nods", "node", "N.ode", ""],
    })
    got = (entity_resolution(rd.from_pandas(df), normalize=False,
                             num_partitions=4)
           .to_pandas().set_index("entity").canonical.to_dict())
    # Node-Nods dist 1; Node-node dist 1 (byte case flip); N.ode is
    # dist 1 from Node via the '.' insert -> all one cluster; e5
    # (empty label) is dropped entirely
    assert got == {"e1": "e1", "e2": "e1", "e3": "e1", "e4": "e1"}


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab", min_size=1, max_size=7),
       st.text(alphabet="ab", min_size=1, max_size=7))
def test_deletion_blocking_perfect_recall_d2(a, b):
    """The cover property at depth 2: lev <= 2 implies the depth-2
    deletion neighborhoods intersect."""
    ab, bb = a.encode(), b.encode()
    if _naive_lev(ab, bb) <= 2:
        assert deletion_keys(ab, 2) & deletion_keys(bb, 2)
