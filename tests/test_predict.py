"""cli.predict: serve an exported artifact from image files + omic CSV.

The CLI must reproduce the direct in-process forward on the same decoded,
center-cropped pixels — including the ragged-tail padding for fixed-shape
artifacts and filename-keyed omic CSV alignment."""
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.models.factory import define_model
from multimodal_learning_tpu.serve import export_infer, make_infer_fn
from multimodal_learning_tpu.serve.export import manifest, write_artifact

SIZE = 64
N = 5  # not a multiple of the fixed batch -> exercises tail padding


def _opt(**kw):
    base = dict(mode="pathomic", task="grad", input_size_path=SIZE,
                batch_size=4, label_dim=3, synthetic_data=True)
    base.update(kw)
    return Options(**base)


def _export(opt, tmp_path, batch_size, seed=0):
    model = define_model(opt)
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed)}
    if opt.mode == "pathomic":
        v = model.init(rngs, x_path=jnp.zeros((1, SIZE, SIZE, 3)),
                       x_omic=jnp.zeros((1, opt.input_size_omic)),
                       train=False)
    else:  # unimodal models take one positional input (train/steps.py:_apply)
        x = (jnp.zeros((1, SIZE, SIZE, 3)) if opt.mode == "path"
             else jnp.zeros((1, opt.input_size_omic)))
        v = model.init(rngs, x, train=False)
    params, stats = v["params"], v.get("batch_stats", {})
    blob, outs = export_infer(opt, model, params, stats, batch_size)
    path = os.path.join(str(tmp_path), "m_1.stablehlo")
    write_artifact(path, blob, manifest(opt, batch_size, outs))
    direct = jax.jit(make_infer_fn(opt, model, params, stats))
    return path, direct


def _write_images(tmp_path, n=N, hw=(SIZE + 10, SIZE + 6), seed=1):
    """PNGs (lossless) slightly larger than SIZE -> center crop is real."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    files = []
    for i in range(n):
        arr = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        p = os.path.join(str(tmp_path), f"roi_{i}.png")
        Image.fromarray(arr).save(p)
        files.append(p)
    return files


def _write_csv(tmp_path, omic, key_files=None, shuffle_seed=None):
    import pandas as pd
    df = pd.DataFrame(np.asarray(omic))
    if key_files is not None:
        df.insert(0, "file", [os.path.basename(f) for f in key_files])
        if shuffle_seed is not None:
            df = df.sample(frac=1, random_state=shuffle_seed)
    p = os.path.join(str(tmp_path), "omic.csv")
    df.to_csv(p, index=False)
    return p


def _expected_inputs(files):
    from multimodal_learning_tpu.cli.predict import _load_images
    x_path = _load_images(files, SIZE)
    rng = np.random.default_rng(2)
    x_omic = rng.normal(size=(len(files), 80)).astype(np.float32)
    return x_path, x_omic


def test_predict_fixed_batch_matches_direct(tmp_path):
    from multimodal_learning_tpu.cli import predict

    opt = _opt()
    art, direct = _export(opt, tmp_path, 4)
    files = _write_images(tmp_path)
    x_path, x_omic = _expected_inputs(files)
    csv = _write_csv(tmp_path, x_omic)
    out_pkl = os.path.join(str(tmp_path), "preds.pkl")

    res = predict.main(["--artifact", art, "--images", *files,
                        "--omic_csv", csv, "--out", out_pkl, "--quiet"])

    want = direct(x_path[:4], x_omic[:4])  # first full batch, no padding
    for k in want:
        np.testing.assert_array_equal(res[k][:4], np.asarray(want[k]))
    # ragged tail (N=5, B=4): padded execution must not leak into row 4
    tail = direct(np.repeat(x_path[4:5], 4, 0), np.repeat(x_omic[4:5], 4, 0))
    for k in tail:
        np.testing.assert_array_equal(res[k][4], np.asarray(tail[k])[0])

    assert res["grade"].shape == (N,)
    np.testing.assert_allclose(res["prob"].sum(axis=1), 1.0, rtol=1e-4)
    saved = pickle.load(open(out_pkl, "rb"))
    assert saved["files"] == files
    np.testing.assert_array_equal(saved["grade"], res["grade"])


def test_predict_keyed_csv_aligns_by_basename(tmp_path):
    from multimodal_learning_tpu.cli import predict

    opt = _opt()
    art, direct = _export(opt, tmp_path, 4, seed=3)
    files = _write_images(tmp_path, n=4)
    x_path, x_omic = _expected_inputs(files)
    # rows shuffled on disk; the key column must realign them
    csv = _write_csv(tmp_path, x_omic, key_files=files, shuffle_seed=7)

    res = predict.main(["--artifact", art, "--images", *files,
                        "--omic_csv", csv, "--quiet"])
    want = direct(x_path, x_omic)
    for k in want:
        np.testing.assert_array_equal(res[k], np.asarray(want[k]))


def test_predict_dynamic_artifact_chunks(tmp_path):
    from multimodal_learning_tpu.cli import predict

    opt = _opt()
    art, direct = _export(opt, tmp_path, "dynamic", seed=4)
    man = json.load(open(art + ".json"))
    assert man["inputs"]["x_path"].startswith("uint8[b,")
    files = _write_images(tmp_path, n=N)
    x_path, x_omic = _expected_inputs(files)
    csv = _write_csv(tmp_path, x_omic)

    res = predict.main(["--artifact", art, "--images", *files,
                        "--omic_csv", csv, "--batch_size", "2", "--quiet"])
    want = direct(x_path, x_omic)
    for k in want:
        np.testing.assert_allclose(res[k], np.asarray(want[k]),
                                   rtol=1e-6, atol=1e-6)


def test_predict_rejects_mismatched_positional_csv(tmp_path):
    """A positional CSV with more rows than images must refuse (silent
    truncation would mispair omic rows with the sorted image order)."""
    import pytest

    from multimodal_learning_tpu.cli import predict

    opt = _opt()
    art, _ = _export(opt, tmp_path, 4, seed=5)
    files = _write_images(tmp_path, n=3)
    rng = np.random.default_rng(6)
    csv = _write_csv(tmp_path, rng.normal(size=(5, 80)).astype(np.float32))
    with pytest.raises(ValueError, match="positional pairing"):
        predict.main(["--artifact", art, "--images", *files,
                      "--omic_csv", csv, "--quiet"])


def test_predict_rejects_empty_input(tmp_path):
    """A mode=omic artifact fed a header-only CSV passes the arg checks
    with n=0 — must fail with a clear 'no input rows' error."""
    import pytest

    from multimodal_learning_tpu.cli import predict

    opt = _opt(mode="omic")
    art, _ = _export(opt, tmp_path, 4, seed=7)
    csv = _write_csv(tmp_path, np.zeros((0, 80), np.float32))
    with pytest.raises(ValueError, match="no input rows"):
        predict.main(["--artifact", art, "--omic_csv", csv, "--quiet"])
