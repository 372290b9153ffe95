"""End-to-end golden test: the reference's flagship example
(examples/catalogue_30s — real OCR-scanned ALA 1934 catalogue pages)
through the engine's catalogue plan, compared cell-for-cell against the
reference's COMMITTED outputs (generated_output/ALA1934_RR-excerpt.pdf.csv
and .pagegrids.json). SURVEY §5 test plan item 3."""

import json
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

REF_DIR = "/root/reference/examples/catalogue_30s"
GOLD_CSV = os.path.join(REF_DIR, "generated_output/ALA1934_RR-excerpt.pdf.csv")
GOLD_GRIDS = os.path.join(REF_DIR, "generated_output/ALA1934_RR-excerpt.pdf.pagegrids.json")

needs_ref = pytest.mark.skipif(
    not os.path.exists(GOLD_CSV), reason="reference example data not present")


@pytest.fixture(scope="module")
def ala_dir():
    d = tempfile.mkdtemp(prefix="ala_golden_")
    shutil.copy(os.path.join(REF_DIR, "data/ALA1934_RR-excerpt.pdf.xml"), d)
    for p in range(1, 5):
        shutil.copy(os.path.join(
            REF_DIR, "data/ALA1934_RR-excerpt.pdf-%d_1.png" % p), d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@needs_ref
@pytest.mark.slow
def test_catalogue_matches_reference_golden_outputs(spark, ala_dir):
    from pdftabextract_spark.plans.catalogue import catalogue_extract

    cells, positions = catalogue_extract(spark, ala_dir)

    # --- grid parity: borders vs the committed pagegrids.json ---
    gold_grids = json.load(open(GOLD_GRIDS))
    pos = {r["page"]: r for r in positions.collect()}
    assert sorted(pos) == [1, 2, 3, 4]
    for p, g in ((int(k), v) for k, v in gold_grids.items()):
        g_cols = sorted({c[0][0] for row in g for c in row}
                        | {row[-1][1][0] for row in g})
        g_rows = sorted({row[0][0][1] for row in g} | {g[-1][0][1][1]})
        mc = np.asarray(pos[p]["col_positions"])
        mr = np.asarray(pos[p]["row_positions"])
        assert len(mc) == len(g_cols) == 17
        assert len(mr) == len(g_rows)
        # column borders within 1 page-px of the reference (sub-pixel
        # Hough quantization differences vs cv2); rows within 1e-3 (pure
        # textbox arithmetic, modulo the page-skew repair angle whose
        # estimate differs from cv2's in the last theta bins)
        assert np.max(np.abs(mc - np.asarray(g_cols))) < 1.0
        assert np.max(np.abs(mr - np.asarray(g_rows))) < 1e-3

    # --- cell parity: every cell equals the committed CSV ---
    gold = pd.read_csv(GOLD_CSV, dtype=str, keep_default_na=False)
    gold_cols = [c for c in gold.columns if c.startswith("col")]
    mine = cells.toPandas()
    mine["page"] = mine["page"].astype(int)
    piv = (mine.pivot_table(index=["page", "row_idx"], columns="col_idx",
                            values="cell_text", aggfunc="first")
           .sort_index().reset_index(drop=True))
    assert len(piv) == len(gold)
    assert piv.shape[1] == len(gold_cols)
    mismatches = []
    for j, gc in enumerate(gold_cols):
        gv = gold[gc].to_numpy()
        mv = piv[j].fillna("").astype(str).to_numpy()
        bad = np.flatnonzero(mv != gv)
        mismatches.extend((int(i), gc, gv[i], mv[i]) for i in bad[:3])
    assert not mismatches, "cell mismatches vs golden CSV: %s" % mismatches[:10]
