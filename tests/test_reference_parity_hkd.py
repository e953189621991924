"""HKD (GNNLoss) parity against the reference's OWN torch code.

``/root/reference/MIA 2022/distiller_zoo/GNN.py`` is the one loss family
that imports dgl (absent from this image), so round-3 could only unit-test
:mod:`multimodal_learning_tpu.contrast.hkd`.  Here the reference module is
loaded UNMODIFIED with dgl's import surface stubbed:

- ``dgl.backend`` — thin torch wrappers implementing exactly the documented
  backend API the reference calls (``ndim/unsqueeze/shape/swapaxes/argtopk/
  copy_to/cpu/zeros_like/reshape/arange/asnumpy``), so the reference's own
  ``cos_distance_softmax`` + ``knn_graph`` (``GNN.py:20-49``) run verbatim;
- ``DGLGraph(adj, readonly=True)`` — keeps the scipy adjacency dense with
  old-dgl row=dst/col=src semantics (``A @ h`` aggregates src->dst);
- ``TAGConv`` — a torch transliteration of dgl's published ``tagconv.py``
  forward (symmetric IN-degree norm, one Linear over ``cat([h, Ah])``),
  the only reference dependency that cannot be imported as-is.

Pinned against the reference code itself:
- ``NCEAverage`` bank pulls/update/get_smooth (``GNN.py:51-106``) vs
  ``HKDBank`` indexing / ``hkd_bank_update`` / ``_momentum_rows(0.75)``;
- ``knn_graph`` adjacency (``GNN.py:20-49``) vs ``knn_adjacency``;
- ``NCESoftmaxLoss`` (``GNN.py:108-119``) vs ``nce_softmax_loss``;
- ``Encoder`` = TAGConv(k=1)+l2norm (``GNN.py:198-207``) vs ``TAGEncoder``;
- the FULL ``GNNLoss.forward`` (``GNN.py:136-196``) — both InfoNCE stages +
  graph smoothing + bank momentum update — vs the exact composition the
  student step uses (``train/student.py:231-255,453-458``).
"""
import importlib.util
import math
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
scipy_sparse = pytest.importorskip("scipy.sparse")

from multimodal_learning_tpu.contrast.crd import Embed  # noqa: E402
from multimodal_learning_tpu.contrast.hkd import (  # noqa: E402
    HKDBank, TAGEncoder, _momentum_rows, hkd_bank_update, hkd_graph_scores,
    hkd_scores, knn_adjacency, nce_softmax_loss)

GNN_PATH = "/root/reference/MIA 2022/distiller_zoo/GNN.py"
FEAT = 16
B = 16  # >= knn=8 so GNNLoss takes the graph branch
N_DATA = 64
K = 8  # nce_k


class _StubDGLGraph:
    """Old-dgl ``DGLGraph(adj, readonly=True)``: rows=dst, cols=src.

    UNVERIFIED ASSUMPTION (advisor r4): the row=dst reading of the csr
    adjacency is asserted, not pinned against real dgl — dgl is not
    installed in this image and SNIPPETS.md carries no TAGConv source.  If
    legacy dgl actually built edges row->col (row=src), both the message
    direction and the in-degrees here are transposed, and this stub would
    pass anyway because ``contrast/hkd.py`` encodes the same reading.  The
    kNN graph is built from a *symmetrised* cosine-similarity relation in
    practice only when mutual-neighbour pairs dominate, so the two readings
    are NOT generally equivalent.  If dgl ever becomes installable, pin one
    saved ``TAGConv`` forward on a fixed asymmetric graph and delete this
    caveat."""

    def __init__(self, adj, readonly=True):
        a = np.asarray(adj.todense(), np.float32)
        assert a.shape[0] == a.shape[1], (
            "reference csr shape is square only when every node is some "
            "node's neighbour — holds here because the -eye diagonal trick "
            "makes every node its own nearest")
        self.A = torch.tensor(a)
        self.ndata = {}

    def to(self, device):
        return self

    def in_degrees(self):
        return self.A.sum(1)


class _StubTAGConv(torch.nn.Module):
    """dgl.nn.pytorch.TAGConv's published forward: k powers of the
    in-degree-normalised adjacency, one Linear over the concat stack."""

    def __init__(self, in_feats, out_feats, k=2, bias=True):
        super().__init__()
        self._k = k
        self.lin = torch.nn.Linear(in_feats * (k + 1), out_feats, bias=bias)

    def forward(self, graph, feat):
        norm = torch.pow(graph.in_degrees().clamp(min=1),
                         -0.5).unsqueeze(-1)
        fstack = [feat]
        for _ in range(self._k):
            rst = fstack[-1] * norm
            rst = graph.A @ rst
            rst = rst * norm
            fstack.append(rst)
        return self.lin(torch.cat(fstack, dim=-1))


def _torch_backend_stub():
    """The documented dgl.backend functions GNN.py calls, as torch."""
    be = types.ModuleType("dgl.backend")
    be.ndim = lambda x: x.dim()
    be.unsqueeze = lambda x, d: x.unsqueeze(d)
    be.shape = lambda x: tuple(x.shape)
    be.swapaxes = lambda x, a, b: x.transpose(a, b)
    be.argtopk = lambda x, k, dim, descending: torch.topk(
        x, k, dim, largest=descending)[1]
    be.copy_to = lambda x, ctx: x.to(ctx)
    be.cpu = lambda: torch.device("cpu")
    be.zeros_like = torch.zeros_like
    be.reshape = lambda x, s: x.reshape(s)
    be.arange = lambda lo, hi: torch.arange(lo, hi)
    be.asnumpy = lambda x: x.cpu().numpy()
    return be


@pytest.fixture(scope="module")
def ref_gnn():
    """Import the reference GNN.py verbatim under the dgl stub."""
    dgl = types.ModuleType("dgl")
    dgl.backend = _torch_backend_stub()
    dgl.DGLGraph = _StubDGLGraph
    dgl.graph = lambda uv: types.SimpleNamespace(to=lambda dev: None)
    dgl.function = types.ModuleType("dgl.function")
    nn_mod = types.ModuleType("dgl.nn")
    pyt = types.ModuleType("dgl.nn.pytorch")
    pyt.TAGConv = _StubTAGConv
    factory = types.ModuleType("dgl.nn.pytorch.factory")
    factory.KNNGraph = type("KNNGraph", (), {})  # imported, never used
    pyt.factory = factory
    nn_mod.pytorch = pyt
    dgl.nn = nn_mod
    mods = {"dgl": dgl, "dgl.backend": dgl.backend, "dgl.function":
            dgl.function, "dgl.nn": nn_mod, "dgl.nn.pytorch": pyt,
            "dgl.nn.pytorch.factory": factory}
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("ref_gnn", GNN_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    """The reference hardcodes .cuda() on tensors and modules."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _unit_rows(rng, n, d):
    v = rng.normal(size=(n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _make_ref_bank(ref_gnn, mem_l, mem_ab):
    nce = ref_gnn.NCEAverage(mem_l.shape[1], mem_l.shape[0], K)
    with torch.no_grad():
        nce.memory_l.copy_(torch.tensor(mem_l))
        nce.memory_ab.copy_(torch.tensor(mem_ab))
    return nce


def test_nceaverage_pulls_and_update(ref_gnn):
    """forward/get_pos bank pulls + the 0.9-momentum update (GNN.py:51-106)."""
    rng = _rng(1)
    mem_l = _unit_rows(rng, N_DATA, FEAT)
    mem_ab = _unit_rows(rng, N_DATA, FEAT)
    y = rng.choice(N_DATA, size=B, replace=False)
    idx = rng.integers(0, N_DATA, size=(B, K))
    l_new = _unit_rows(rng, B, FEAT)
    ab_new = _unit_rows(rng, B, FEAT)

    nce = _make_ref_bank(ref_gnn, mem_l, mem_ab)
    w_t, w_s = nce(B, torch.tensor(y), torch.tensor(idx))
    bank = HKDBank(jnp.asarray(mem_l), jnp.asarray(mem_ab))
    np.testing.assert_allclose(np.asarray(bank.memory_l[idx]),
                               w_t.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bank.memory_ab[idx]),
                               w_s.numpy(), rtol=1e-6)

    p_l, p_ab = nce.get_pos(torch.tensor(y))
    np.testing.assert_allclose(np.asarray(bank.memory_l[y]), p_l.numpy())
    np.testing.assert_allclose(np.asarray(bank.memory_ab[y]), p_ab.numpy())

    nce.update(torch.tensor(l_new), torch.tensor(ab_new), torch.tensor(y))
    new = hkd_bank_update(bank, jnp.asarray(l_new), jnp.asarray(ab_new),
                          jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(new.memory_l),
                               nce.memory_l.numpy(), rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new.memory_ab),
                               nce.memory_ab.numpy(), rtol=2e-6, atol=1e-7)


def test_get_smooth_momentum(ref_gnn):
    """0.75-momentum smoothing of bank rows (GNN.py:76-90)."""
    rng = _rng(2)
    mem_l = _unit_rows(rng, N_DATA, FEAT)
    mem_ab = _unit_rows(rng, N_DATA, FEAT)
    y = rng.choice(N_DATA, size=B, replace=False)
    l = _unit_rows(rng, B, FEAT)
    ab = _unit_rows(rng, B, FEAT)

    nce = _make_ref_bank(ref_gnn, mem_l, mem_ab)
    s_l, s_ab = nce.get_smooth(torch.tensor(l), torch.tensor(ab),
                               torch.tensor(y))
    got_l = _momentum_rows(jnp.asarray(mem_l), jnp.asarray(l),
                           jnp.asarray(y), 0.75)
    got_ab = _momentum_rows(jnp.asarray(mem_ab), jnp.asarray(ab),
                            jnp.asarray(y), 0.75)
    np.testing.assert_allclose(np.asarray(got_l), s_l.numpy(), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(got_ab), s_ab.numpy(), rtol=2e-6)


def test_knn_graph_adjacency(ref_gnn):
    """The softmax-cosine kNN graph (GNN.py:20-49) vs knn_adjacency."""
    rng = _rng(3)
    logits = rng.normal(size=(B, 3)).astype(np.float32)
    g = ref_gnn.knn_graph(torch.tensor(logits), ref_gnn.knn)
    ours = knn_adjacency(jnp.asarray(logits), ref_gnn.knn)
    np.testing.assert_array_equal(np.asarray(ours), g.A.numpy())
    # the -eye diagonal trick guarantees self-loops
    assert np.all(np.diag(np.asarray(ours)) == 1)


def test_nce_softmax_loss(ref_gnn):
    rng = _rng(4)
    scores = rng.normal(size=(B, K + 1)).astype(np.float32)
    ref = ref_gnn.NCESoftmaxLoss()(torch.tensor(scores))
    got = nce_softmax_loss(jnp.asarray(scores))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def _copy_embed(ref_embed, params):
    """Reference Embed.linear -> our Embed(mlp=False) fc1."""
    with torch.no_grad():
        w = ref_embed.linear.weight.numpy()
        b = ref_embed.linear.bias.numpy()
    return {"fc1": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}}


def _copy_tag(ref_encoder):
    """Reference Encoder.conv1.lin [out, 2*in] -> our w0/w1 split; the
    single torch bias lands on w0, w1's bias zero."""
    with torch.no_grad():
        w = ref_encoder.conv1.lin.weight.numpy()   # [out, 2*in]
        b = ref_encoder.conv1.lin.bias.numpy()
    return {"w0": {"kernel": jnp.asarray(w[:, :FEAT].T),
                   "bias": jnp.asarray(b)},
            "w1": {"kernel": jnp.asarray(w[:, FEAT:].T),
                   "bias": jnp.zeros_like(jnp.asarray(b))}}


def test_tag_encoder_parity(ref_gnn):
    """Encoder = TAGConv(k=1) + l2norm (GNN.py:198-207) vs TAGEncoder on
    the reference's own knn graph."""
    rng = _rng(5)
    logits = rng.normal(size=(B, 3)).astype(np.float32)
    h = _unit_rows(rng, B, FEAT)

    enc = ref_gnn.Encoder(FEAT, FEAT)
    g = ref_gnn.knn_graph(torch.tensor(logits), ref_gnn.knn)
    g.ndata["h"] = torch.tensor(h)
    with torch.no_grad():
        ref_out = enc(g).numpy()

    adj = knn_adjacency(jnp.asarray(logits), ref_gnn.knn)
    ours = TAGEncoder(FEAT).apply({"params": _copy_tag(enc)}, adj,
                                  jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(ours), ref_out,
                               rtol=2e-5, atol=2e-6)


def test_gnnloss_full_forward(ref_gnn):
    """Full GNNLoss.forward (GNN.py:136-196) — both InfoNCE stages, graph
    smoothing, and the bank update — vs the student step's composition
    (train/student.py:231-255 + the post-step bank update :453-458)."""
    rng = _rng(6)
    d_s, d_t = 24, 20
    opt = types.SimpleNamespace(s_dim=d_s, t_dim=d_t, feat_dim=FEAT,
                                n_data=N_DATA, nce_k=K, batch_size=B)
    ref = ref_gnn.GNNLoss(opt)
    mem_l = _unit_rows(rng, N_DATA, FEAT)
    mem_ab = _unit_rows(rng, N_DATA, FEAT)
    with torch.no_grad():
        ref.contrast.memory_l.copy_(torch.tensor(mem_l))
        ref.contrast.memory_ab.copy_(torch.tensor(mem_ab))

    f_s = rng.normal(size=(B, d_s)).astype(np.float32)
    f_t = rng.normal(size=(B, d_t)).astype(np.float32)
    l_s = rng.normal(size=(B, 3)).astype(np.float32)   # student logits
    l_t = rng.normal(size=(B, 3)).astype(np.float32)   # teacher logits
    y = rng.choice(N_DATA, size=B, replace=False)
    contrast_idx = rng.integers(0, N_DATA, size=(B, K))

    with torch.no_grad():
        ref_loss = ref(0, torch.tensor(f_s), torch.tensor(l_s),
                       torch.tensor(f_t), torch.tensor(l_t),
                       torch.tensor(y), torch.tensor(contrast_idx))

    # ---- ours: the composition the student step runs --------------------
    embed = Embed(FEAT, mlp=False)
    p_es = _copy_embed(ref.embed_s, None)
    p_et = _copy_embed(ref.embed_t, None)
    bank = HKDBank(jnp.asarray(mem_l), jnp.asarray(mem_ab))
    f_es = embed.apply({"params": p_es}, jnp.asarray(f_s))
    f_et = embed.apply({"params": p_et}, jnp.asarray(f_t))
    out_s, out_t = hkd_scores(bank, f_es, f_et, jnp.asarray(y),
                              jnp.asarray(contrast_idx))
    loss = nce_softmax_loss(out_s) + nce_softmax_loss(out_t)

    gnn = TAGEncoder(FEAT)
    adj_s = knn_adjacency(jnp.asarray(l_s), ref_gnn.knn)
    adj_t = knn_adjacency(jnp.asarray(l_t), ref_gnn.knn)
    f_gs = gnn.apply({"params": _copy_tag(ref.gnn_s)}, adj_s, f_es)
    f_gt = gnn.apply({"params": _copy_tag(ref.gnn_t)}, adj_t, f_et)
    out_gs, out_gt = hkd_graph_scores(bank, f_gs, f_gt, jnp.asarray(y),
                                      jnp.asarray(contrast_idx))
    loss = loss + nce_softmax_loss(out_gs) + nce_softmax_loss(out_gt)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-5, atol=2e-6)

    # the reference updates its bank in-forward (:195); the step does it
    # post-step with the same embeds — end state must match
    new = hkd_bank_update(bank, f_es, f_et, jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(new.memory_l),
                               ref.contrast.memory_l.numpy(),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(new.memory_ab),
                               ref.contrast.memory_ab.numpy(),
                               rtol=2e-5, atol=2e-6)


def test_gnnloss_small_batch_skips_graph(ref_gnn):
    """batchSize < knn -> independent-sample InfoNCE only (GNN.py:163-164)."""
    rng = _rng(7)
    b = 4
    d_s, d_t = 24, 20
    opt = types.SimpleNamespace(s_dim=d_s, t_dim=d_t, feat_dim=FEAT,
                                n_data=N_DATA, nce_k=K, batch_size=b)
    ref = ref_gnn.GNNLoss(opt)
    mem_l = _unit_rows(rng, N_DATA, FEAT)
    mem_ab = _unit_rows(rng, N_DATA, FEAT)
    with torch.no_grad():
        ref.contrast.memory_l.copy_(torch.tensor(mem_l))
        ref.contrast.memory_ab.copy_(torch.tensor(mem_ab))
    f_s = rng.normal(size=(b, d_s)).astype(np.float32)
    f_t = rng.normal(size=(b, d_t)).astype(np.float32)
    y = rng.choice(N_DATA, size=b, replace=False)
    contrast_idx = rng.integers(0, N_DATA, size=(b, K))
    with torch.no_grad():
        ref_loss = ref(0, torch.tensor(f_s), torch.zeros(b, 3),
                       torch.tensor(f_t), torch.zeros(b, 3),
                       torch.tensor(y), torch.tensor(contrast_idx))

    embed = Embed(FEAT, mlp=False)
    bank = HKDBank(jnp.asarray(mem_l), jnp.asarray(mem_ab))
    f_es = embed.apply({"params": _copy_embed(ref.embed_s, None)},
                       jnp.asarray(f_s))
    f_et = embed.apply({"params": _copy_embed(ref.embed_t, None)},
                       jnp.asarray(f_t))
    out_s, out_t = hkd_scores(bank, f_es, f_et, jnp.asarray(y),
                              jnp.asarray(contrast_idx))
    loss = nce_softmax_loss(out_s) + nce_softmax_loss(out_t)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-5, atol=2e-6)
