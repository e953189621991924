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


# ---------------------------------------------------------------- KIRC recipe

@pytest.fixture(scope="module")
def ref_utils_data():
    """The reference's core/utils_data.py imports only os/pandas/numpy —
    loadable directly (core/ has no __init__.py)."""
    import importlib.util
    import os
    p = os.path.join(MICCAI, "core", "utils_data.py")
    spec = importlib.util.spec_from_file_location("ref_utils_data", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_KIRC_GENES = ["KDR", "MET", "VHL", "PBRM1", "SETD2", "BAP1"]


def _fabricate_kirc(root, n=6):
    import os
    rng = np.random.default_rng(23)
    samples = [f"TCGA-A3-{1000+i}-01" for i in range(n)]
    patients = [s[:-3] for s in samples]

    pd.DataFrame({
        "Study ID": ["kirc_tcga"] * n,
        "Patient ID": patients,
        "Sample ID": samples,
        "Overall Survival Status": rng.choice(["LIVING", "DECEASED"], n),
    }).to_csv(f"{root}/kirc_tcga_pan_can_atlas_2018_clinical_data.tsv",
              sep="\t", index=False)

    def omic_table(name, values):
        df = pd.DataFrame(values, columns=samples)
        df.insert(0, "Entrez_Gene_Id", np.arange(len(df)) + 100)
        df.index = pd.Index(_KIRC_GENES + [np.nan], name="Hugo_Symbol")
        df.to_csv(f"{root}/{name}", sep="\t")

    # +1 NaN-named gene row exercises the notnull filter
    omic_table("data_RNA_Seq_v2_mRNA_median_Zscores.txt",
               rng.normal(size=(len(_KIRC_GENES) + 1, n)).round(4))
    omic_table("data_CNA.txt",
               rng.integers(-2, 3, size=(len(_KIRC_GENES) + 1, n)))

    pd.DataFrame({"PValue": [1e-5, 1e-4, 2e-3, 1e-2],
                  "logFC": [2.0, -1.5, 1.1, 0.7]},
                 index=pd.Index(["VHL", "MET", "KDR", "SETD2"],
                                name="gene")).to_csv(
        f"{root}/dataDEGs_kirc.csv")

    pd.DataFrame({"CNA": ["DEL", "AMP", "DEL", "AMP", "DEL", "DEL"],
                  "Profiled Samples": [n] * 6,
                  "Freq": ["2.0%", "10.0%", "30.0%", "8.0%", "5.0%",
                           "12.0%"]},
                 index=pd.Index(_KIRC_GENES, name="Gene")).to_csv(
        f"{root}/CNA_Genes.txt", sep="\t")

    os.makedirs(f"{root}/muts", exist_ok=True)
    return samples, patients


def test_get_clean_kirc_matches_reference_without_muts(tmp_path,
                                                       ref_utils_data):
    """With an empty muts/ dir the reference's latent indexing crash never
    fires, so the full rnaseq+cnv join must match bit-for-bit."""
    from multimodal_learning_tpu.data.tcga import get_clean_kirc

    _fabricate_kirc(tmp_path)
    ref = ref_utils_data.getCleanKIRC(dataroot=str(tmp_path))
    ours = get_clean_kirc(dataroot=str(tmp_path))
    assert list(ours.columns) == list(ref.columns)
    # DEG intersection + >=7% CNV frequency filter both applied
    assert {"VHL_rnaseq", "MET_rnaseq", "VHL_cnv", "BAP1_cnv"} <= \
        set(ours.columns)
    assert "KDR_cnv" not in ours.columns  # 2% < 7% cutoff
    pd.testing.assert_frame_equal(ours, ref, check_dtype=False)


def test_get_clean_kirc_fixes_reference_mut_crash(tmp_path, ref_utils_data):
    """The reference raises on ANY muts/*.tsv (``mut.index[:-3]`` is a
    positional slice -> boolean mask 3 short of the frame); ours strips the
    sample suffix as intended and keeps full gene names (the reference's
    ``rstrip('.tsv')`` strips a char class — harmless for uppercase symbols
    like MET since rstrip is case-sensitive, but a hazard for names ending
    in lowercase t/s/v/'.'; ours removes the exact suffix)."""
    from multimodal_learning_tpu.data.tcga import get_clean_kirc

    samples, patients = _fabricate_kirc(tmp_path)
    for gene, carriers in (("VHL", patients[:3]), ("MET", patients[3:4])):
        pd.DataFrame({"Patient ID": carriers}).to_csv(
            f"{tmp_path}/muts/mutated_samples_{gene}.tsv", sep="\t",
            index=False)

    with pytest.raises(Exception):
        ref_utils_data.getCleanKIRC(dataroot=str(tmp_path))

    ours = get_clean_kirc(dataroot=str(tmp_path))
    assert {"VHL_mut", "MET_mut"} <= set(ours.columns)
    np.testing.assert_array_equal(
        ours.loc[samples, "VHL_mut"].to_numpy(),
        np.array([1, 1, 1, 0, 0, 0]))
    np.testing.assert_array_equal(
        ours.loc[samples, "MET_mut"].to_numpy(),
        np.array([0, 0, 0, 1, 0, 0]))


def test_change_histomolecular_subtype_matches_reference(ref_utils_data):
    """Re-subtyping a pooled frame (``core/utils_data.py:27-44``) — drop the
    stale column, re-derive from the int-coded Molecular subtype/Histology."""
    from multimodal_learning_tpu.data.tcga import \
        change_histomolecular_subtype

    rng = np.random.default_rng(5)
    n = 20
    df = pd.DataFrame({
        "Histomolecular subtype": np.array(["stale"] * n, dtype=object),
        "Molecular subtype": rng.integers(-1, 3, n),
        "Histology": rng.integers(-1, 4, n),
        "Hazard": rng.normal(size=n).round(3),
    })
    ref = ref_utils_data.changeHistomolecularSubtype(df.copy())
    ours = change_histomolecular_subtype(df.copy())
    assert list(ours.columns) == list(ref.columns)
    pd.testing.assert_frame_equal(ours.astype(object), ref.astype(object),
                                  check_dtype=False)
