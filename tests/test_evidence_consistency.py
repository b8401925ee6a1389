"""docs/EVIDENCE.md must never claim artifacts that don't exist.

Round-4 verdict's worst finding: the evidence index carried rows for
artifacts that were planned but never produced (`ACCUM_SWEEP_r04.json`,
`LONGSEQ_r04.json`, a `docs/RESULTS_r04.md` render) and a CL_RUN row that
claimed algorithm runs the committed JSON didn't contain. This test makes
that class of overclaim mechanically impossible:

  * every artifact named in the index table's first column exists at the
    repo root (ranges like ``BENCH_r01..r04.json`` expand);
  * every checked-in producer script named in the second column exists;
  * every ``docs/*.md`` render referenced anywhere in the file exists;
  * every CL_RUN row carries an explicit ``runs: enc/algo, ...`` manifest
    that exactly matches the (encoder, algorithm) records in the JSON, and
    every listed run has returncode 0.
"""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVIDENCE = os.path.join(REPO, "docs", "EVIDENCE.md")

pytestmark = pytest.mark.smoke


def _table_rows():
    rows = []
    with open(EVIDENCE) as f:
        for line in f:
            if not line.startswith("|"):
                continue
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if len(cells) >= 3 and cells[0] not in ("Artifact", "---"):
                rows.append(cells)
    # the header separator row looks like `---|---|---`
    return [r for r in rows if not set(r[0]) <= {"-"}]


def _expand_artifacts(cell):
    """First-column cell -> list of repo-root artifact filenames."""
    names = []
    for tok in re.findall(r"`([^`]+)`", cell):
        m = re.match(r"^([A-Za-z0-9_]+)_r(\d+)\.\.r(\d+)\.json$", tok)
        if m:
            names += [f"{m.group(1)}_r{i:02d}.json"
                      for i in range(int(m.group(2)), int(m.group(3)) + 1)]
        else:
            names.append(tok)
    return names


def test_every_artifact_in_index_exists():
    rows = _table_rows()
    assert rows, "EVIDENCE.md artifact table not found"
    missing = []
    for cells in rows:
        for name in _expand_artifacts(cells[0]):
            if not os.path.exists(os.path.join(REPO, name)):
                missing.append(name)
    assert not missing, f"EVIDENCE.md references missing artifacts: {missing}"


def test_every_producer_script_exists():
    missing = []
    for cells in _table_rows():
        for tok in re.findall(r"`([^`]+)`", cells[1]):
            # producer cells may also name CLI invocations; only check
            # tokens that look like repo paths
            if "/" in tok and not tok.startswith("-"):
                path = tok.split()[0].lstrip("/")
                if not os.path.exists(os.path.join(REPO, path)):
                    missing.append(tok)
    assert not missing, f"EVIDENCE.md references missing producers: {missing}"


def test_every_referenced_doc_exists():
    text = open(EVIDENCE).read()
    missing = [p for p in re.findall(r"`(docs/[A-Za-z0-9_./-]+)`", text)
               if not os.path.exists(os.path.join(REPO, p))]
    assert not missing, f"EVIDENCE.md references missing docs: {missing}"


def test_cl_run_rows_match_their_artifacts():
    checked = 0
    for cells in _table_rows():
        arts = [a for a in _expand_artifacts(cells[0])
                if a.startswith("CL_RUN") and a.endswith(".json")]
        if not arts:
            continue
        claim = cells[2]
        m = re.search(r"runs:\s*([A-Za-z0-9_/,+\- ]+?)(?:\s+—|\s+-\s|$)", claim)
        assert m, (f"CL_RUN row for {arts} must carry an explicit "
                   f"'runs: enc/algo, ...' manifest so this test can check it")
        claimed = {tuple(tok.strip().split("/"))
                   for tok in m.group(1).split(",") if "/" in tok}
        for art in arts:
            path = os.path.join(REPO, art)
            with open(path) as f:
                data = json.load(f)
            actual = {(r.get("encoder", "vilt"), r["algorithm"]): r
                      for r in data.get("runs", [])}
            assert claimed == set(actual), (
                f"{art}: row claims {sorted(claimed)} but artifact holds "
                f"{sorted(actual)}")
            bad_rc = {k: v.get("returncode") for k, v in actual.items()
                      if v.get("returncode") != 0}
            assert not bad_rc, (
                f"{art}: claimed runs with nonzero returncode: {bad_rc}")
            checked += 1
    assert checked >= 2, "expected at least the r03 and r04 CL_RUN rows"
