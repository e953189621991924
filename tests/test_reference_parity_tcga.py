"""TCGA CSV-pipeline parity against the reference's OWN ``getCleanAllDataset``
(``MICCAI-2022/utils.py:469-535``).

``data/tcga.py`` is deliberately the closest transliteration in the repo —
the cleaning recipe must match bit-for-bit for CV-split parity — so this
test fabricates ``all_dataset.csv`` / ``grade_data.csv`` with every branch
the recipe has (missing molecular triplets, missing histology+grade, the
'astrocytoma (glioblastoma)' rename, median imputation) and asserts the two
functions return identical DataFrames.
"""
import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")  # ref utils.py imports torch

from test_reference_parity_aekd import MICCAI, _install_stubs  # noqa: E402

from multimodal_learning_tpu.data.tcga import get_clean_all_dataset  # noqa: E402


@pytest.fixture(autouse=True)
def _legacy_pandas(monkeypatch):
    """The reference targets pandas<2.1.  Two dtype-only compat shims let its
    code run unmodified on modern pandas: restore the removed ``applymap``
    alias, and make ``insert`` of a float array use object dtype (legacy
    pandas silently upcast the column when ``addHistomolecularSubtype``
    assigned subtype strings into it; modern pandas raises instead)."""
    if not hasattr(pd.DataFrame, "applymap"):
        monkeypatch.setattr(pd.DataFrame, "applymap", pd.DataFrame.map,
                            raising=False)
    orig_insert = pd.DataFrame.insert

    def insert(self, loc, column, value, allow_duplicates=False):
        if isinstance(value, np.ndarray) and value.dtype.kind == "f":
            value = value.astype(object)
        return orig_insert(self, loc, column, value,
                           allow_duplicates=allow_duplicates)

    monkeypatch.setattr(pd.DataFrame, "insert", insert)


@pytest.fixture(scope="module")
def ref_utils():
    _install_stubs()
    import sys
    if MICCAI not in sys.path:
        sys.path.insert(0, MICCAI)
    import utils
    return utils


def _fabricate(root):
    rng = np.random.default_rng(17)
    n = 24
    ids = [f"TCGA-{i:02d}-{1000+i}" for i in range(n)]

    omic = {f"gene_{g}": rng.normal(size=n).round(4) for g in range(6)}
    # the molecular triplet must be jointly missing (the recipe asserts it)
    idh = rng.normal(size=n).round(4)
    codel = rng.normal(size=n).round(4)
    missing_mol = [3, 7, 11]
    idh[missing_mol] = np.nan
    codel[missing_mol] = np.nan
    # an unrelated omic column with its own NaNs exercises median imputation
    omic["gene_0"][[1, 5]] = np.nan

    all_df = pd.DataFrame({
        "indexes": np.arange(n),
        "TCGA ID": ids,
        **omic,
        "idh mutation": idh,
        "codeletion": codel,
        "censored": rng.integers(0, 2, size=n),
        "Survival months": rng.uniform(1, 120, size=n).round(1),
    })
    all_df.to_csv(f"{root}/all_dataset.csv", index=False)

    hist = rng.choice(["astrocytoma", "oligoastrocytoma",
                       "oligodendroglioma", "astrocytoma (glioblastoma)"],
                      size=n).astype(object)
    grade = rng.choice([2.0, 3.0, 4.0], size=n)
    mol = np.array(["IDHwt", "IDHmut-non-codel", "IDHmut-codel"],
                   dtype=object)[rng.integers(0, 3, size=n)]
    mol[missing_mol] = np.nan
    missing_hist = [2, 9]
    hist[missing_hist] = np.nan
    grade = grade.astype(object)
    grade[missing_hist] = np.nan
    grade_df = pd.DataFrame({
        "TCGA ID": ids, "Histology": hist, "Grade": grade,
        "Molecular subtype": mol,
    })
    grade_df.to_csv(f"{root}/grade_data.csv", index=False)


@pytest.mark.parametrize("ignore_mol", [False, True])
@pytest.mark.parametrize("ignore_hist", [False, True])
def test_get_clean_all_dataset(tmp_path, ref_utils, ignore_mol, ignore_hist):
    _fabricate(tmp_path)
    ref_meta, ref_df = ref_utils.getCleanAllDataset(
        dataroot=str(tmp_path), ignore_missing_moltype=ignore_mol,
        ignore_missing_histype=ignore_hist)
    ours_meta, ours_df = get_clean_all_dataset(
        dataroot=str(tmp_path), ignore_missing_moltype=ignore_mol,
        ignore_missing_histype=ignore_hist)
    assert list(ours_meta) == list(ref_meta)
    assert list(ours_df.columns) == list(ref_df.columns)
    assert list(ours_df.index) == list(ref_df.index)
    pd.testing.assert_frame_equal(
        ours_df.reset_index(drop=True).astype(object),
        ref_df.reset_index(drop=True).astype(object),
        check_dtype=False)
