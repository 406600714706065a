"""Contract gates the r9 verdict asked to make mechanical:

1. SURVEY.md must name every catalog query (the generated
   §2-EXT-MAP makes this 1:1 greppable; regenerate with
   `python tools/survey_map.py` after adding a query).
2. The committed full-catalog proof artifact (ORACLE_FULL_r*.txt)
   must cover exactly the current catalog — a semantics-changing or
   catalog-growing commit without a regenerated artifact turns the
   suite red, so the artifact can never silently lag HEAD again
   (r9's "What's wrong #1").

Both are pure-file checks — no Spark session.
"""

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _catalog_names():
    from loudml_spark.catalog import QUERIES
    return set(QUERIES)


def test_survey_names_every_catalog_query():
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    missing = sorted(q for q in _catalog_names() if q not in survey)
    assert not missing, (
        f"SURVEY.md is missing {len(missing)} catalog queries "
        f"(run `python tools/survey_map.py`): {missing[:10]}")


def test_survey_map_is_current():
    """The generated map block itself lists exactly the catalog —
    stale rows (renamed/removed queries) fail too."""
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    m = re.search(
        r"BEGIN CATALOG MAP.*?END CATALOG MAP", survey, re.S)
    assert m, "generated catalog map block missing from SURVEY.md"
    in_map = set(re.findall(r"^\| `([a-z0-9_]+)` \|", m.group(0),
                            re.M))
    cat = _catalog_names()
    assert in_map == cat, (
        f"map stale: only-in-map={sorted(in_map - cat)[:5]} "
        f"only-in-catalog={sorted(cat - in_map)[:5]} "
        "(run `python tools/survey_map.py`)")


def test_oracle_full_artifact_matches_catalog():
    arts = glob.glob(os.path.join(REPO, "ORACLE_FULL_r*.txt"))
    assert arts, "no ORACLE_FULL artifact committed"
    latest = max(
        arts, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    names = set()
    ok = 0
    for line in open(latest):
        m = re.match(r"(OK|FAIL)\s+(\S+)", line)
        if m:
            names.add(m.group(2))
            ok += m.group(1) == "OK"
    cat = _catalog_names()
    assert names == cat, (
        f"{os.path.basename(latest)} covers {len(names)} queries, "
        f"catalog has {len(cat)} — regenerate the artifact "
        f"(python tools/check_oracle.py > ORACLE_FULL_rN.txt): "
        f"missing={sorted(cat - names)[:8]} "
        f"stale={sorted(names - cat)[:8]}")
    assert ok == len(names), f"{len(names) - ok} FAIL rows in {latest}"


# --- r12 prose-trace gate (r11 verdict "What's wrong #2") -----------
# The generated §2-EXT-MAP stops NAME drift; these two stop PROSE
# drift: every catalog query must trace to a human-written family
# row (§2-CORE / §2-EXT tables), and every query-shaped token those
# rows cite must still exist in the catalog — a renamed or removed
# query turns the stale prose row red.

import fnmatch


def _survey_prose():
    """SURVEY.md minus the generated catalog-map block."""
    text = open(os.path.join(REPO, "SURVEY.md")).read()
    return re.sub(r"<!-- BEGIN CATALOG MAP.*?END CATALOG MAP -->",
                  "", text, flags=re.S)


def _prose_table_query_tokens(prose):
    """Backticked query-shaped tokens from the LAST cell of every
    §2-CORE / §2-EXT prose-table row (the 'Catalog queries' column).
    `\\|` escapes a literal pipe inside a cell; `*` marks a glob."""
    start = prose.index("### §2-CORE")
    end = prose.index("## 3. Query lifecycle")
    toks = set()
    for line in prose[start:end].splitlines():
        if not line.startswith("|") or line.startswith("|---"):
            continue
        cells = re.split(r"(?<!\\)\|", line.strip().strip("|"))
        last = cells[-1]
        for t in re.findall(r"`([a-z0-9_*]+)`", last):
            if len(t) > 3:          # skip prose fragments like `k1`
                toks.add(t)
    return toks


def test_every_catalog_query_traces_to_prose():
    prose = _survey_prose()
    globs = [t for t in set(re.findall(r"`([a-z0-9_*]+)`", prose))
             if "*" in t]
    missing = sorted(
        q for q in _catalog_names()
        if q not in prose
        and not any(fnmatch.fnmatch(q, g) for g in globs))
    assert not missing, (
        f"{len(missing)} catalog queries have NO human-written "
        f"SURVEY family row (the generated map doesn't count) — add "
        f"a §2-CORE/§2-EXT row: {missing[:10]}")


def test_prose_table_cites_no_stale_queries():
    prose = _survey_prose()
    cat = _catalog_names()
    stale = sorted(
        t for t in _prose_table_query_tokens(prose)
        if (t not in cat if "*" not in t
            else not any(fnmatch.fnmatch(q, t) for q in cat)))
    assert not stale, (
        f"SURVEY prose tables cite {len(stale)} tokens that match "
        f"no catalog query (renamed/removed?): {stale[:10]}")
