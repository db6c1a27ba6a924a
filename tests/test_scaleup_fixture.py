"""Pin the scale probe's content-disjoint fixture tagging (v3).

The 32x content fixture's linearity claim rests on replicas being
token-disjoint while each replica keeps the base corpus's token
statistics. v1 tagging turned leading/trailing whitespace runs into
bare 'r{r}z' tokens shared by every doc of a replica (r9 advice);
v2 strips boundary whitespace first; v3 additionally tags
blank/whitespace-only docs to '' instead of a bare shared 'r{r}z'
token. The cached fixture path is keyed on the scheme version
(CONTENT_TAG_SCHEME='tagv3') so a bump can never serve a stale cache.
"""

from __future__ import annotations

import duckdb
import pandas as pd

import scripts.scaleup_probe as sp


def test_content_fixture_tags_every_token_no_bare_tags(tmp_path, monkeypatch):
    base = tmp_path / "base"
    base.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            # boundary whitespace runs + a whitespace-only doc (v3:
            # must tag to '', not a bare shared 'r{r}z' token)
            "text": ["  hello world\tfoo \n", " \t\n "],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [19, 4],
        }
    ).to_parquet(base / "documents.parquet")
    monkeypatch.setattr(sp, "BASE", str(base))

    dst = tmp_path / f"content2_{sp.CONTENT_TAG_SCHEME}"
    sp.build_content_fixture(str(dst), 2)
    rows = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{dst}/documents.parquet') ORDER BY doc_id"
    ).fetchall()

    assert [r[0] for r in rows] == [1, 2, 1 + sp.OFF, 2 + sp.OFF]
    # Every token carries its replica tag; no bare 'r{r}z' boundary
    # tokens, and token-disjointness across replicas holds exactly.
    assert rows[0][1] == "r0zhello r0zworld r0zfoo"
    assert rows[2][1] == "r1zhello r1zworld r1zfoo"
    # Whitespace-only docs tag to empty, in every replica.
    assert rows[1][1] == "" and rows[3][1] == ""
    # n_chars recomputed from the rewritten text.
    for _, text, n_chars in rows:
        assert n_chars == len(text)
    assert not set(rows[0][1].split()) & set(rows[2][1].split())


def test_content_fixture_cache_is_scheme_keyed(tmp_path, monkeypatch):
    """main() derives the fixture dirs from CONTENT_TAG_SCHEME, so a
    scheme bump changes the path and can't hit a stale cache. Pin the
    derivation by checking build_content_fixture's own early-return:
    same dst -> cached; different (scheme-keyed) dst -> rebuilt."""
    base = tmp_path / "base"
    base.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["a b c"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [5],
        }
    ).to_parquet(base / "documents.parquet")
    monkeypatch.setattr(sp, "BASE", str(base))

    d1 = tmp_path / f"c1_{sp.CONTENT_TAG_SCHEME}"
    sp.build_content_fixture(str(d1), 1)
    mtime = (d1 / "documents.parquet").stat().st_mtime_ns
    sp.build_content_fixture(str(d1), 1)  # cached: untouched
    assert (d1 / "documents.parquet").stat().st_mtime_ns == mtime

    d2 = tmp_path / "c1_tagv999"  # a bumped scheme lands elsewhere
    sp.build_content_fixture(str(d2), 1)
    assert (d2 / "documents.parquet").exists()


def test_content_subprocess_cmd_isolates_content_group():
    """r13 verdict #2: the content-fixture probes must run in a FRESH
    subprocess (not last in the interleaved session, where three rounds
    running they inherited locality decay and breached the 4x bar
    in-suite before adjudicating clean isolated). Pin the child
    invocation: same script, same dst, content-only query subset, REPS
    forwarded, and the no-recursion guard set."""
    argv, env = sp._content_subprocess_cmd(
        "/tmp/sfx32", 32, sp.CONTENT_QUERIES, "/tmp/child.json"
    )
    assert argv[0] == __import__("sys").executable
    assert argv[1].endswith("scaleup_probe.py")
    assert argv[2] == "/tmp/sfx32" and argv[3] == "/tmp/child.json"
    assert env["SPARK_GRAFT_PROBE_REPS"] == "32"
    assert env["SPARK_GRAFT_PROBE_QUERIES"] == ",".join(sp.CONTENT_QUERIES)
    # The child must never re-spawn: the guard both prevents recursion
    # and is how main() distinguishes "I am the isolated child".
    assert env["SPARK_GRAFT_PROBE_NO_SUBPROC"] == "1"
