"""End-to-end golden test: the reference's schoollist_1 example (real
JPEG-scanned double pages of German school lists, OCR'd) through the
engine's schoollist plan, compared cell-for-cell against the reference's
COMMITTED outputs (generated_output/schoollist_1.pdf.csv and
.pagegrids.json). SURVEY §5 test plan item 3 / §3.2."""

import json
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

REF_DIR = "/root/reference/examples/schoollist_1"
GOLD_CSV = os.path.join(REF_DIR, "generated_output/schoollist_1.pdf.csv")
GOLD_GRIDS = os.path.join(REF_DIR,
                          "generated_output/schoollist_1.pdf.pagegrids.json")

needs_ref = pytest.mark.skipif(
    not os.path.exists(GOLD_CSV), reason="reference example data not present")


@pytest.fixture(scope="module")
def sl1_dir():
    d = tempfile.mkdtemp(prefix="sl1_golden_")
    shutil.copy(os.path.join(REF_DIR, "data/schoollist_1.pdf.xml"), d)
    for p in range(1, 4):
        shutil.copy(os.path.join(
            REF_DIR, "data/schoollist_1.pdf-%d_1.jpg" % p), d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@needs_ref
@pytest.mark.slow
def test_schoollist1_matches_reference_golden_outputs(spark, sl1_dir):
    from pdftabextract_spark.plans.schoollist import schoollist1_extract

    cells, positions, _ = schoollist1_extract(spark, sl1_dir)

    # --- grid parity: borders vs the committed pagegrids.json within
    # 1e-4 page-px (the +-1-LSB JPEG-decode difference vs libjpeg nudges
    # a handful of Hough votes; everything downstream is float-exact) ---
    gold_grids = json.load(open(GOLD_GRIDS))
    pos = {r["page"]: r for r in positions.collect()}
    assert sorted(pos) == [2, 3, 4, 5, 6]  # split page 1 has no table
    for p, g in ((int(k), v) for k, v in gold_grids.items()):
        g_cols = sorted({c[0][0] for row in g for c in row}
                        | {row[-1][1][0] for row in g})
        g_rows = sorted({row[0][0][1] for row in g} | {g[-1][0][1][1]})
        mc = np.asarray(pos[p]["col_positions"])
        mr = np.asarray(pos[p]["row_positions"])
        assert len(mc) == len(g_cols) == 7
        assert len(mr) == len(g_rows)
        assert np.max(np.abs(mc - np.asarray(g_cols))) < 1e-4
        assert np.max(np.abs(mr - np.asarray(g_rows))) < 1e-4

    # --- cell parity: every cell (multi-line, split_texts_in_lines=True)
    # equals the committed CSV, including from_page attribution ---
    gold = pd.read_csv(GOLD_CSV, dtype=str, keep_default_na=False)
    gold_cols = [c for c in gold.columns if c.startswith("col")]
    mine = cells.toPandas()
    mine["page"] = mine["page"].astype(int)
    piv = (mine.pivot_table(index=["page", "row_idx"], columns="col_idx",
                            values="cell_text", aggfunc="first")
           .sort_index().reset_index())
    assert len(piv) == len(gold)
    assert (piv["page"].to_numpy()
            == gold["from_page"].astype(int).to_numpy()).all()
    mismatches = []
    for j, gc in enumerate(gold_cols):
        gv = gold[gc].to_numpy()
        mv = piv[j].fillna("").astype(str).to_numpy()
        bad = np.flatnonzero(mv != gv)
        mismatches.extend((int(i), gc, gv[i], mv[i]) for i in bad[:3])
    assert not mismatches, "cell mismatches vs golden CSV: %s" % mismatches[:10]


REF2_DIR = "/root/reference/examples/schoollist_2"
GOLD2_CSV = os.path.join(REF2_DIR, "generated_output/schoollist_2.pdf.csv")
GOLD2_GRIDS = os.path.join(REF2_DIR,
                           "generated_output/schoollist_2.pdf.pagegrids.json")


@pytest.fixture(scope="module")
def sl2_dir():
    d = tempfile.mkdtemp(prefix="sl2_golden_")
    shutil.copy(os.path.join(REF2_DIR, "data/schoollist_2.pdf.xml"), d)
    for p in range(1, 4):
        shutil.copy(os.path.join(
            REF2_DIR, "data/schoollist_2.pdf-%d_1.jpg" % p), d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.skipif(not os.path.exists(GOLD2_CSV),
                    reason="reference example data not present")
@pytest.mark.slow
def test_schoollist2_matches_reference_golden_outputs(spark, sl2_dir):
    """schoollist_2: midline split of color (YCbCr 4:2:0) scans,
    horizontal-only rotation decision, text-distribution rows/columns,
    per-doc median column correction. Grid borders within 0.5 page-px
    (the +-1-LSB JPEG decode vs libjpeg can move one text border across
    a cluster boundary); every cell equals the committed CSV."""
    from pdftabextract_spark.plans.schoollist import schoollist2_extract

    cells, positions, _ = schoollist2_extract(spark, sl2_dir)

    gold_grids = json.load(open(GOLD2_GRIDS))
    pos = {r["page"]: r for r in positions.collect()}
    assert sorted(pos) == [1, 2, 3, 4, 5, 6]
    for p, g in ((int(k), v) for k, v in gold_grids.items()):
        g_cols = sorted({c[0][0] for row in g for c in row}
                        | {row[-1][1][0] for row in g})
        g_rows = sorted({row[0][0][1] for row in g} | {g[-1][0][1][1]})
        mc = np.asarray(pos[p]["col_positions"])
        mr = np.asarray(pos[p]["row_positions"])
        assert len(mc) == len(g_cols) == 5
        assert len(mr) == len(g_rows)
        assert np.max(np.abs(mc - np.asarray(g_cols))) < 1e-4
        assert np.max(np.abs(mr - np.asarray(g_rows))) < 0.5

    gold = pd.read_csv(GOLD2_CSV, dtype=str, keep_default_na=False)
    gold_cols = [c for c in gold.columns if c.startswith("col")]
    mine = cells.toPandas()
    mine["page"] = mine["page"].astype(int)
    piv = (mine.pivot_table(index=["page", "row_idx"], columns="col_idx",
                            values="cell_text", aggfunc="first")
           .sort_index().reset_index())
    assert len(piv) == len(gold)
    assert (piv["page"].to_numpy()
            == gold["from_page"].astype(int).to_numpy()).all()
    mismatches = []
    for j, gc in enumerate(gold_cols):
        gv = gold[gc].to_numpy()
        mv = piv[j].fillna("").astype(str).to_numpy()
        bad = np.flatnonzero(mv != gv)
        mismatches.extend((int(i), gc, gv[i], mv[i]) for i in bad[:3])
    assert not mismatches, "cell mismatches vs golden CSV: %s" % mismatches[:10]
