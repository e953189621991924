"""CRD memory-bank parity against the reference's OWN torch modules.

``test_crd.py`` pins :mod:`multimodal_learning_tpu.contrast.crd` against
numpy transliterations; here every memory generation is run against the
reference's actual classes so a shared misreading cannot slip through:

- v1  ``ContrastMemory`` + ``ContrastLoss``
  (``MICCAI-2022/CL_utils/CRD_criterion.py:8-141,191-216``)
- v2  ``ContrastMemory_v2`` hard-positive selection
  (``MICCAI-2022/CL_utils/memory_new.py:83-222``)
- v3  ``ContrastMemory_v3`` positive + negative selection, and the
  multi-positive ``ContrastLoss_v2`` (batch and per-sample ``sample_KD``)
  (``memory_new.py:225-397``, ``CL_utils/CRD_loss.py:212-253``)
- v4  ``ContrastMemory_v4`` soft negative reweighting
  (``MIA 2022/CL_utils/memory_new.py:398-561``)
- mono ``ContrastMemory_mono`` one-directional scores
  (``MIA 2022/CL_utils/memory_new.py:565-700``)

The torch modules hardcode ``.cuda()`` on buffers/tensors (their
device-portability bug); ``_no_cuda`` shims those calls to identity so the
reference code runs unmodified on CPU.  Deterministic paths only
(``select_pos_mode="hard"``): the stochastic modes draw from ``np.random``
on the torch side and from JAX PRNG here, so only their rank-window
semantics are pinned (in ``test_crd.py``).
"""
import importlib
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from multimodal_learning_tpu.contrast.crd import (  # noqa: E402
    CRDBank, contrast_loss, crd_scores, crd_scores_select, init_bank)

pytestmark = pytest.mark.smoke

MICCAI = "/root/reference/MICCAI-2022"
MIA22 = "/root/reference/MIA 2022"


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    """Make the reference's hardcoded .cuda() calls identity on CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=True)


def _load(path, name):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_miccai():
    return _load(f"{MICCAI}/CL_utils/CRD_criterion.py", "ref_crd_criterion")


@pytest.fixture(scope="module")
def ref_memory():
    return _load(f"{MICCAI}/CL_utils/memory_new.py", "ref_memory_new")


@pytest.fixture(scope="module")
def ref_memory22():
    return _load(f"{MIA22}/CL_utils/memory_new.py", "ref_memory_new_22")


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _mk_inputs(rng, n, d, b, s):
    """Two successive batches of (v1, v2, y, idx)."""
    batches = []
    used = rng.permutation(n)
    for step in range(2):
        v1 = rng.normal(size=(b, d)).astype(np.float32)
        v2 = rng.normal(size=(b, d)).astype(np.float32)
        y = used[step * b:(step + 1) * b].astype(np.int64)
        idx = np.stack([
            np.concatenate([[y[i]],
                            rng.choice(n, s - 1, replace=False)])
            for i in range(b)]).astype(np.int64)
        batches.append((v1, v2, y, idx))
    return batches


def _bank_from(mem_cls_instance):
    # .numpy() VIEWS the torch buffer and jnp.asarray may zero-copy it on
    # CPU — the reference's in-place index_copy_ would then mutate our bank;
    # force a real copy.
    return CRDBank(
        jnp.array(mem_cls_instance.memory_v1.numpy().copy()),
        jnp.array(mem_cls_instance.memory_v2.numpy().copy()),
        jnp.asarray(-1.0), jnp.asarray(-1.0))


def _t(x):
    return torch.from_numpy(x)


def test_contrast_memory_v1(ref_miccai, rng):
    """Scores, first-batch Z freeze, and momentum bank updates over two
    steps match ``ContrastMemory`` exactly (CRD_criterion.py:25-81)."""
    n, d, b, K = 40, 16, 4, 7
    mem = ref_miccai.ContrastMemory(d, n, K, T=0.07, momentum=0.5)
    bank = _bank_from(mem)

    for v1, v2, y, idx in _mk_inputs(rng, n, d, b, K + 1):
        r1, r2 = mem(_t(v1), _t(v2), _t(y), _t(idx))
        o1, o2, bank = crd_scores(bank, jnp.asarray(v1), jnp.asarray(v2),
                                  jnp.asarray(y), jnp.asarray(idx))
        np.testing.assert_allclose(np.asarray(o1), r1.squeeze(-1).numpy(),
                                   rtol=3e-5)
        np.testing.assert_allclose(np.asarray(o2), r2.squeeze(-1).numpy(),
                                   rtol=3e-5)

    np.testing.assert_allclose(np.asarray(bank.memory_v1),
                               mem.memory_v1.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bank.memory_v2),
                               mem.memory_v2.numpy(), rtol=1e-5, atol=1e-6)
    # frozen normalisation constants
    np.testing.assert_allclose(float(bank.z_v1), mem.params[2].item(),
                               rtol=3e-5)
    np.testing.assert_allclose(float(bank.z_v2), mem.params[3].item(),
                               rtol=3e-5)


def test_contrast_loss_v1(ref_miccai, rng):
    """NCE binary log-loss matches ``ContrastLoss`` (CRD_criterion.py:191)."""
    n, b, s = 100, 5, 9
    x = rng.uniform(0.01, 2.0, size=(b, s)).astype(np.float32)
    ref = ref_miccai.ContrastLoss(n)(_t(x).unsqueeze(-1))
    ours = contrast_loss(jnp.asarray(x), n)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_contrast_memory_v2_hard(ref_memory, rng):
    """v2 hard-positive selection (no negative selection) matches
    ``ContrastMemory_v2`` (memory_new.py:83-222)."""
    n, d, b = 48, 16, 4
    P, K, P2 = 6, 10, 3
    mem = ref_memory.ContrastMemory_v2(d, n, P, K, T=0.07, momentum=0.5,
                                       select_pos_pairs=True, P2=P2)
    bank = _bank_from(mem)

    for v1, v2, y, idx in _mk_inputs(rng, n, d, b, P + K):
        r1, r2 = mem(0, _t(v1), _t(v2), _t(y), _t(idx),
                     select_pos_mode="hard")
        o1, o2, bank, _ = crd_scores_select(
            bank, jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(y),
            jnp.asarray(idx), P=P, K=K, P2=P2, K2=0,
            select_pos_mode="hard", select_neg_pairs=False)
        np.testing.assert_allclose(np.asarray(o1), r1.squeeze(-1).numpy(),
                                   rtol=3e-5)
        np.testing.assert_allclose(np.asarray(o2), r2.squeeze(-1).numpy(),
                                   rtol=3e-5)

    np.testing.assert_allclose(np.asarray(bank.memory_v1),
                               mem.memory_v1.numpy(), rtol=1e-5, atol=1e-6)


def test_contrast_memory_v3_hard(ref_memory, rng):
    """v3 positive AND negative selection matches ``ContrastMemory_v3``
    (memory_new.py:225-397; its neg branch keys on the STRING "True")."""
    n, d, b = 48, 16, 4
    P, K, P2, K2 = 6, 12, 3, 5
    mem = ref_memory.ContrastMemory_v3(
        d, n, P, K, T=0.07, momentum=0.5, select_pos_pairs=True, P2=P2,
        select_neg_pairs="True", K2=K2)
    bank = _bank_from(mem)

    for v1, v2, y, idx in _mk_inputs(rng, n, d, b, P + K):
        r1, r2 = mem(0, _t(v1), _t(v2), _t(y), _t(idx),
                     select_pos_mode="hard")
        o1, o2, bank, _ = crd_scores_select(
            bank, jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(y),
            jnp.asarray(idx), P=P, K=K, P2=P2, K2=K2,
            select_pos_mode="hard", select_neg_pairs=True)
        np.testing.assert_allclose(np.asarray(o1), r1.squeeze(-1).numpy(),
                                   rtol=3e-5)
        np.testing.assert_allclose(np.asarray(o2), r2.squeeze(-1).numpy(),
                                   rtol=3e-5)


def test_contrast_loss_v2_multi_pos(ref_memory, rng):
    """Multi-positive ``ContrastLoss_v2`` (CRD_loss.py:212-253): batch form
    averages the positive log-terms over P2 and the per-sample ``sample_KD``
    form returns one loss per query."""
    # CRD_loss.py does ``from .memory_new import ...`` — give it a package
    if "ref_clutils" not in sys.modules:
        pkg = types.ModuleType("ref_clutils")
        pkg.__path__ = [f"{MICCAI}/CL_utils"]
        sys.modules["ref_clutils"] = pkg
    crd_loss = importlib.import_module("ref_clutils.CRD_loss")
    n, b, P2, K = 80, 5, 3, 8
    x = rng.uniform(0.01, 2.0, size=(b, P2 + K)).astype(np.float32)

    ref_batch = crd_loss.ContrastLoss_v2(n, sample_KD="False")(
        _t(x).unsqueeze(-1), P2)
    ours_batch = contrast_loss(jnp.asarray(x), n, n_pos=P2)
    np.testing.assert_allclose(float(ours_batch), float(ref_batch),
                               rtol=1e-5)

    ref_per = crd_loss.ContrastLoss_v2(n, sample_KD="True")(
        _t(x).unsqueeze(-1), P2)
    ours_per = contrast_loss(jnp.asarray(x), n, n_pos=P2, per_sample=True)
    np.testing.assert_allclose(np.asarray(ours_per),
                               ref_per.squeeze().numpy(), rtol=1e-5)


def test_contrast_memory_v4_neg_reweight(ref_memory22, rng):
    """v4 (MIA 2022): fixed relation orientation for the positive sort and
    multiplicative soft negative weights inside the Z estimate
    (memory_new.py:398-561)."""
    n, d, b = 48, 16, 4
    P, K, P2 = 6, 10, 3
    mem = ref_memory22.ContrastMemory_v4(
        d, n, P, K, T=0.07, momentum=0.5, select_pos_pairs=True, P2=P2,
        select_neg_pairs=False, neg_reweight="True", K2=0)
    bank = _bank_from(mem)

    for v1, v2, y, idx in _mk_inputs(rng, n, d, b, P + K):
        r1, r2 = mem(0, _t(v1), _t(v2), _t(y), _t(idx),
                     select_pos_mode="hard")
        o1, o2, bank, _ = crd_scores_select(
            bank, jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(y),
            jnp.asarray(idx), P=P, K=K, P2=P2, K2=0,
            select_pos_mode="hard", neg_reweight=True)
        np.testing.assert_allclose(np.asarray(o1), r1.squeeze(-1).numpy(),
                                   rtol=3e-5)
        np.testing.assert_allclose(np.asarray(o2), r2.squeeze(-1).numpy(),
                                   rtol=3e-5)


def test_contrast_memory_mono(ref_memory22, rng):
    """mono (MIA 2022, reference-dead: only built by the commented-out
    ``CRDLoss_v2``): one-directional scores.  The reference is called with
    ``(v1=teacher, v2=student)`` and banks ``(m1=teacher, m2=student)``; our
    convention is the mirror image, so its ``out_v2`` equals our ``out_v1``
    with ``pos_sort='v4'`` (memory_new.py:565-700)."""
    n, d, b = 48, 16, 4
    P, K, P2 = 6, 10, 3
    mem = ref_memory22.ContrastMemory_mono(
        d, n, P, K, T=0.07, momentum=0.5, select_pos_pairs=True, P2=P2)
    # our memory_v1 is the bank updated with our v1 (student) = ref m2
    bank = CRDBank(jnp.array(mem.memory_v2.numpy().copy()),
                   jnp.array(mem.memory_v1.numpy().copy()),
                   jnp.asarray(-1.0), jnp.asarray(-1.0))

    for v1, v2, y, idx in _mk_inputs(rng, n, d, b, P + K):
        # ref arg order: (teacher, student) = (v2, v1) of our convention
        r_out, _ = mem(0, _t(v2), _t(v1), _t(y), _t(idx),
                       select_pos_mode="hard")
        o1, _, bank, _ = crd_scores_select(
            bank, jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(y),
            jnp.asarray(idx), P=P, K=K, P2=P2, K2=0,
            select_pos_mode="hard", select_neg_pairs=False, pos_sort="v4")
        np.testing.assert_allclose(np.asarray(o1), r_out.squeeze(-1).numpy(),
                                   rtol=3e-5)


# ---------------------------------------------------------------------------
# CLAT stage-2 v10 (MIA 2023/stage2_unimodal_student/CL_utils/CRD_criterion_v10.py)

S2 = "/root/reference/MIA 2023/stage2_unimodal_student"


@pytest.fixture(scope="module")
def ref_v10():
    pytest.importorskip("sklearn")
    return _load(f"{S2}/CL_utils/CRD_criterion_v10.py", "ref_crd_v10")


def _v10_setup(rng, n, d, b, K, C=3):
    labels = rng.integers(0, C, size=n).astype(np.int64)
    class_idx = [np.where(labels == c)[0] for c in range(C)]
    class_mask = np.stack([(labels == c).astype(np.float32)
                           for c in range(C)])
    y = rng.choice(n, b, replace=False).astype(np.int64)
    idx = np.stack([
        np.concatenate([[y[i]], rng.choice(n, K, replace=False)])
        for i in range(b)]).astype(np.int64)
    v1 = rng.normal(size=(b, d)).astype(np.float32)
    v2 = rng.normal(size=(b, d)).astype(np.float32)
    return labels, class_idx, class_mask, y, idx, v1, v2


def test_crd_v10_neighbors(ref_v10, rng):
    """'neighbors' mode: same-class masked kNN positives from the bank, with
    the returned similarity weights, matches the reference's sklearn
    cosine_similarity + torch.sort path (CRD_criterion_v10.py:70-80)."""
    from multimodal_learning_tpu.contrast.crd_v10 import crd_v10_scores

    n, d, b, K, P = 60, 16, 4, 9, 3
    labels, class_idx, class_mask, y, idx, v1, v2 = _v10_setup(
        rng, n, d, b, K)
    mem = ref_v10.ContrastMemory(d, n, class_idx, K, T=0.07, momentum=0.5)
    bank = _bank_from(mem)
    batch_label = labels[y]

    for step in range(2):
        if step == 1:
            v1 = rng.normal(size=(b, d)).astype(np.float32)
            v2 = rng.normal(size=(b, d)).astype(np.float32)
        r1, r2, rs1, rs2 = mem(P, "neighbors", _t(v1), _t(v2),
                               _t(batch_label), _t(y), _t(idx))
        o1, o2, sim_s, sim_t, bank = crd_v10_scores(
            bank, jnp.asarray(v1), jnp.asarray(v2),
            jnp.asarray(batch_label), jnp.asarray(y), jnp.asarray(idx),
            class_mask=jnp.asarray(class_mask), num_pos=P,
            pos_extra="neighbors")
        np.testing.assert_allclose(np.asarray(o1), r1.squeeze(-1).numpy(),
                                   rtol=3e-5)
        np.testing.assert_allclose(np.asarray(o2), r2.squeeze(-1).numpy(),
                                   rtol=3e-5)
        # sim_s weights the student loss = the reference's t_similarity
        # (v2-side); sim_t = its s_similarity (v1-side)
        np.testing.assert_allclose(np.asarray(sim_t), rs1.numpy(), rtol=3e-5)
        np.testing.assert_allclose(np.asarray(sim_s), rs2.numpy(), rtol=3e-5)

    np.testing.assert_allclose(np.asarray(bank.memory_v1),
                               mem.memory_v1.numpy(), rtol=1e-5, atol=1e-6)


def test_crd_v10_losses(ref_v10, rng):
    """Per-query-weighted ContrastLoss (:241-276) and similarity-weighted
    ContrastLoss_v2 (:280-314) match contrast_loss_v10."""
    from multimodal_learning_tpu.contrast.crd_v10 import contrast_loss_v10

    n, b, P, K = 80, 5, 3, 8
    x = rng.uniform(0.01, 2.0, size=(b, P + K)).astype(np.float32)
    w = rng.uniform(0.0, 2.0, size=(b,)).astype(np.float32)
    sims = rng.uniform(0.1, 1.0, size=(b, P)).astype(np.float32)

    ref_l, ref_sl = ref_v10.ContrastLoss(n)(_t(w), _t(x).unsqueeze(-1), P)
    ours_l, ours_sl = contrast_loss_v10(jnp.asarray(x), n, P, jnp.asarray(w))
    np.testing.assert_allclose(float(ours_l), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_sl), ref_sl.numpy(),
                               rtol=1e-5)

    ref_l2, ref_sl2 = ref_v10.ContrastLoss_v2(n)(
        _t(w), _t(x).unsqueeze(-1), P, _t(sims))
    ours_l2, ours_sl2 = contrast_loss_v10(jnp.asarray(x), n, P,
                                          jnp.asarray(w),
                                          pos_sims=jnp.asarray(sims))
    np.testing.assert_allclose(float(ours_l2), float(ref_l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_sl2), ref_sl2.numpy(),
                               rtol=1e-5)


def test_crd_v10_centers_mean(ref_v10, rng):
    """'centers' mode with num_pos=2 (the deterministic per-class MEAN
    branch, CRD_criterion_v10.py:84-101): same-class centre prepended as an
    extra positive, other-class centres appended as extra negatives."""
    from multimodal_learning_tpu.contrast.crd_v10 import crd_v10_scores

    n, d, b, K, P = 60, 16, 4, 9, 2
    labels, class_idx, class_mask, y, idx, v1, v2 = _v10_setup(
        rng, n, d, b, K)
    mem = ref_v10.ContrastMemory(d, n, class_idx, K, T=0.07, momentum=0.5)
    bank = _bank_from(mem)
    batch_label = labels[y]

    for step in range(2):
        if step == 1:
            v1 = rng.normal(size=(b, d)).astype(np.float32)
            v2 = rng.normal(size=(b, d)).astype(np.float32)
        r1, r2 = mem(P, "centers", _t(v1), _t(v2),
                     _t(batch_label), _t(y), _t(idx))
        o1, o2, _, _, bank = crd_v10_scores(
            bank, jnp.asarray(v1), jnp.asarray(v2),
            jnp.asarray(batch_label), jnp.asarray(y), jnp.asarray(idx),
            class_mask=jnp.asarray(class_mask), num_pos=P,
            pos_extra="centers", key=jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(o1), r1.squeeze(-1).numpy(),
                                   rtol=3e-5)
        np.testing.assert_allclose(np.asarray(o2), r2.squeeze(-1).numpy(),
                                   rtol=3e-5)
