"""Chi-square / gamma-function kernel tests (scipy replacement), plus mode
tie-break parity and string kernels."""

import numpy as np
import pytest
from hypothesis import given
import hypothesis.strategies as st

from pdftabextract_spark.kernels.stats import chisquare, chi2_sf, mode
from pdftabextract_spark.kernels.strings import levenshtein, rel_levenshtein


def test_chi2_sf_known_values():
    # reference values from the chi-square distribution (R / scipy tables)
    assert abs(chi2_sf(3.841458820694124, 1) - 0.05) < 1e-12
    assert abs(chi2_sf(5.991464547107979, 2) - 0.05) < 1e-12
    assert abs(chi2_sf(7.814727903251179, 3) - 0.05) < 1e-12
    assert abs(chi2_sf(0.0, 5) - 1.0) < 1e-15
    assert chi2_sf(1000.0, 2) < 1e-100


def test_chisquare_matches_scipy_semantics():
    # scipy.stats.chisquare([16,18,16,14,12,12]) == (2.0, 0.8491450360846096)
    stat, p = chisquare([16, 18, 16, 14, 12, 12])
    assert abs(stat - 2.0) < 1e-12
    assert abs(p - 0.8491450360846096) < 1e-10
    # with explicit expected freqs:
    # scipy.stats.chisquare([16,18,16,14,12,12], f_exp=[16,16,16,16,16,8])
    # == (3.5, 0.6233876277495822)
    stat, p = chisquare([16, 18, 16, 14, 12, 12], [16, 16, 16, 16, 16, 8])
    assert abs(stat - 3.5) < 1e-12
    assert abs(p - 0.6233876277495822) < 1e-10


@given(st.lists(st.floats(min_value=0.1, max_value=1e4), min_size=2, max_size=30))
def test_chisquare_p_in_range(widths):
    exp = np.full(len(widths), float(np.mean(widths)))
    stat, p = chisquare(np.array(widths), exp)
    assert stat >= 0
    assert 0 <= p <= 1


def test_mode_tie_breaks_to_smallest():
    assert mode([3, 1, 1, 3]) == 1
    assert mode([5]) == 5
    assert mode([2, 2, 7, 7, 4]) == 2


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2
    assert rel_levenshtein("", "") == 0
    assert rel_levenshtein("abc", "abc") == 0
    assert rel_levenshtein("abc", "xyz") == 1.0


def test_chisquare_shape_mismatch():
    with pytest.raises(ValueError):
        chisquare([1, 2, 3], [1, 2])
