"""Unit tests for the op library against closed-form / numpy references
(test strategy per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mac_network_tpu.config import Config
from mac_network_tpu import ops
from mac_network_tpu.ops.rnn import reverse_sequence, RNNLayer
from mac_network_tpu.ops.attention import exp_mask, masked_softmax, att2smry
from mac_network_tpu.ops.linear import Linear, FCLayer
from mac_network_tpu.ops.mul import Mul
from mac_network_tpu.ops.cnn import CNNLayer
from mac_network_tpu.ops.location import location_l, location_pe, AddLocation


@pytest.fixture
def cfg():
    return Config()


def test_exp_mask(cfg):
    logits = jnp.zeros((2, 5))
    lengths = jnp.array([3, 5])
    masked = exp_mask(logits, lengths)
    np.testing.assert_allclose(masked[0, :3], 0.0)
    assert masked[0, 3] <= -1e29
    np.testing.assert_allclose(masked[1], 0.0)


def test_masked_softmax_sums_to_one_over_valid(cfg):
    logits = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    att = masked_softmax(logits, jnp.array([2]))
    np.testing.assert_allclose(att[0, 2:], 0.0, atol=1e-6)
    np.testing.assert_allclose(att.sum(), 1.0, rtol=1e-6)
    # matches plain softmax over the valid prefix
    expect = jax.nn.softmax(logits[0, :2])
    np.testing.assert_allclose(att[0, :2], expect, rtol=1e-6)


def test_att2smry(cfg):
    att = jnp.array([[0.25, 0.75]])
    feats = jnp.array([[[1.0, 2.0], [3.0, 4.0]]])
    out = att2smry(att, feats)
    np.testing.assert_allclose(out, [[2.5, 3.5]], rtol=1e-6)


def test_linear_shapes_and_act_layer_quirk(cfg):
    x = jnp.ones((4, 8))
    m = Linear(16, cfg, act="RELU")
    params = m.init(jax.random.key(0), x)
    # the hidden stacked layer must exist when act != NON (ops.py:325-328)
    assert "linear_2" in params["params"]
    y = m.apply(params, x)
    assert y.shape == (4, 16)

    m2 = Linear(16, cfg, act="NON")
    p2 = m2.init(jax.random.key(0), x)
    assert "linear_2" not in p2["params"]


def test_linear_scalar_output_uses_vector_weight(cfg):
    x = jnp.ones((4, 7, 8))
    m = Linear(1, cfg)
    params = m.init(jax.random.key(0), x)
    assert params["params"]["weight"].shape == (8,)
    y = m.apply(params, x)
    assert y.shape == (4, 7)


def test_linear_bias_offset(cfg):
    x = jnp.zeros((2, 4))
    m = Linear(3, cfg, bias=1.5)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    np.testing.assert_allclose(y, 1.5)  # zero input, zero-init bias + offset


def test_fc_layer(cfg):
    x = jnp.ones((4, 8))
    m = FCLayer([16, 5], cfg)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (4, 5)


def test_mul_basic_and_broadcast(cfg):
    x = jnp.ones((2, 6, 4)) * 2
    y = jnp.ones((2, 4)) * 3
    m = Mul(cfg, inter_mod="MUL")
    params = m.init(jax.random.key(0), x, y)
    out, xp = m.apply(params, x, y)
    assert out.shape == (2, 6, 4)
    np.testing.assert_allclose(out, 6.0)
    assert xp is None


def test_mul_proj_concat(cfg):
    x = jnp.ones((2, 6, 4))
    y = jnp.ones((2, 4))
    m = Mul(cfg, inter_mod="MUL", proj_dim=8, concat_x=True, concat_proj=True)
    params = m.init(jax.random.key(0), x, y)
    out, xp = m.apply(params, x, y)
    assert out.shape == (2, 6, 16)   # 8 interaction + 8 projected-KB concat
    assert xp.shape == (2, 6, 8)


def test_mul_modes(cfg):
    x = jnp.ones((2, 6, 4))
    y = jnp.ones((2, 4))
    for mode in ("DIAG", "BL", "ADD"):
        m = Mul(cfg, inter_mod=mode)
        params = m.init(jax.random.key(0), x, y)
        out, _ = m.apply(params, x, y)
        assert out.shape == (2, 6, 4), mode


def test_mul_answer_embedding_broadcast(cfg):
    # classifier path: x = answer embeddings [A, E], y = logits [B, E]
    x = jnp.ones((10, 4))
    y = jnp.ones((2, 4))
    m = Mul(cfg, inter_mod="MUL")
    params = m.init(jax.random.key(0), x, y)
    out, _ = m.apply(params, x, y)
    assert out.shape == (2, 10, 4)


def test_reverse_sequence():
    x = jnp.array([[1, 2, 3, 0, 0], [1, 2, 3, 4, 5]])[..., None].astype(jnp.float32)
    r = reverse_sequence(x, jnp.array([3, 5]))
    np.testing.assert_allclose(r[0, :, 0], [3, 2, 1, 0, 0])
    np.testing.assert_allclose(r[1, :, 0], [5, 4, 3, 2, 1])


@pytest.mark.parametrize("cell_type", ["RNN", "GRU", "LSTM", "MiGRU", "MiLSTM"])
def test_rnn_layer_shapes(cfg, cell_type):
    B, L, D, H = 3, 7, 5, 8
    xs = jnp.ones((B, L, D))
    lengths = jnp.array([7, 4, 1])
    m = RNNLayer(H, cfg, bi=False, cell_type=cell_type)
    params = m.init(jax.random.key(0), xs, lengths)
    outs, final = m.apply(params, xs, lengths)
    assert outs.shape == (B, L, H)
    assert final.shape == (B, H)
    # outputs zero past length (dynamic_rnn semantics)
    np.testing.assert_allclose(outs[1, 4:], 0.0)
    np.testing.assert_allclose(outs[2, 1:], 0.0)


def test_rnn_final_state_at_length(cfg):
    """The final state equals the state at t=len, not t=L."""
    B, L, D, H = 2, 6, 4, 8
    key = jax.random.key(1)
    xs = jax.random.normal(key, (B, L, D))
    lengths = jnp.array([3, 6])
    m = RNNLayer(H, cfg, bi=False, cell_type="GRU")
    params = m.init(jax.random.key(0), xs, lengths)
    outs, final = m.apply(params, xs, lengths)
    np.testing.assert_allclose(final[0], outs[0, 2], rtol=1e-5)
    np.testing.assert_allclose(final[1], outs[1, 5], rtol=1e-5)


def test_birnn_concat(cfg):
    B, L, D, H = 2, 5, 4, 8
    xs = jax.random.normal(jax.random.key(1), (B, L, D))
    lengths = jnp.array([5, 3])
    m = RNNLayer(H, cfg, bi=True, cell_type="LSTM")
    params = m.init(jax.random.key(0), xs, lengths)
    outs, final = m.apply(params, xs, lengths)
    assert outs.shape == (B, L, H)     # fw/bw concat of H/2 each
    assert final.shape == (B, H)
    np.testing.assert_allclose(outs[1, 3:], 0.0, atol=1e-6)


def test_lstm_vs_manual(cfg):
    """LSTM step matches a manual BasicLSTMCell computation."""
    from mac_network_tpu.ops.rnn import LSTMCell
    B, D, H = 2, 3, 4
    x = jax.random.normal(jax.random.key(2), (B, D))
    cell = LSTMCell(features=H, in_dim=D)
    c0 = jnp.zeros((B, H)); h0 = jnp.zeros((B, H))
    params = cell.init(jax.random.key(0), (c0, h0), x)
    (c1, h1), out = cell.apply(params, (c0, h0), x)
    w = params["params"]["kernel_w"]
    z = np.concatenate([x, h0], -1) @ np.asarray(w)
    i, j, f, o = np.split(z, 4, axis=-1)
    sigmoid = lambda v: 1 / (1 + np.exp(-v))
    c_ref = c0 * sigmoid(f + 1.0) + sigmoid(i) * np.tanh(j)
    h_ref = np.tanh(c_ref) * sigmoid(o)
    np.testing.assert_allclose(c1, c_ref, rtol=1e-5)
    np.testing.assert_allclose(h1, h_ref, rtol=1e-5)
    np.testing.assert_allclose(out, h_ref, rtol=1e-5)


def test_cnn_layer(cfg):
    x = jnp.ones((2, 14, 14, 16))
    m = CNNLayer([8, 4], cfg)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 14, 14, 4)


def test_locations(cfg):
    g = location_l(4, 5, cfg)
    assert g.shape == (4, 5, 2)
    np.testing.assert_allclose(g[0, 0], [-1.0, -1.0])
    np.testing.assert_allclose(g[-1, -1], [1.0, 1.0])
    pe = location_pe(4, 5, 8, cfg)
    assert pe.shape == (4, 5, 32)


@pytest.mark.parametrize("mod", ["CNCT", "ADD", "MUL", "LIN"])
def test_add_location(cfg, mod):
    x = jnp.ones((2, 4, 5, 6))
    m = AddLocation(cfg, l_dim=8, mod=mod, loc_type="PE", out_dim=6)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 4, 5, 6)


def test_var_dp_mask():
    from mac_network_tpu.ops.dropout import generate_var_dp_mask, apply_var_dp_mask
    mask = generate_var_dp_mask(jax.random.key(0), (100, 50), 0.85)
    assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}
    assert 0.8 < mask.mean() < 0.9
    x = jnp.ones((100, 50))
    y = apply_var_dp_mask(x, mask, 0.85)
    np.testing.assert_allclose(np.asarray(y), np.asarray(mask) / 0.85)


def test_grid_rnn(cfg):
    from mac_network_tpu.ops.rnn import GridRNN
    x = jnp.ones((2, 4, 4, 6))
    m = GridRNN(8, cfg)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 4, 4, 8)


def test_gumbel_softmax():
    from mac_network_tpu.ops.stochastic import gumbel_softmax
    logits = jnp.array([[2.0, 1.0, 0.0]] * 8)
    soft = gumbel_softmax(jax.random.key(0), logits, 1.0, hard=False)
    np.testing.assert_allclose(soft.sum(-1), 1.0, rtol=1e-5)
    hard = gumbel_softmax(jax.random.key(0), logits, 1.0, hard=True)
    assert set(np.unique(np.asarray(hard))) <= {0.0, 1.0}
    np.testing.assert_allclose(hard.sum(-1), 1.0)


def test_parametric_dropout():
    from mac_network_tpu.ops.stochastic import ParametricDropout
    m = ParametricDropout()
    x = jnp.ones((100, 50))
    params = m.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, x, train=True)
    # eval: identity
    np.testing.assert_array_equal(m.apply(params, x, train=False), x)
    y = m.apply(params, x, train=True, rngs={"dropout": jax.random.key(2)})
    # keep ~ sigmoid(2) ~ 0.88
    kept = float((np.asarray(y) > 0).mean())
    assert 0.8 < kept < 0.95


def test_seq2seq_helpers():
    from mac_network_tpu.ops.stochastic import seq2seq_loss, seq2seq_accuracy
    B, L, V = 2, 4, 5
    logits = jnp.full((B, L, V), -10.0).at[:, :, 1].set(10.0)
    targets = jnp.ones((B, L), jnp.int32)
    lengths = jnp.array([4, 2])
    loss = seq2seq_loss(logits, targets, lengths)
    assert float(loss) < 1e-3
    preds = jnp.argmax(logits, -1).astype(jnp.int32)
    acc1, acc2 = seq2seq_accuracy(preds, targets, lengths)
    assert float(acc1) == 1.0 and float(acc2) == 1.0


def test_proj_lstm_cell(cfg):
    from mac_network_tpu.ops.rnn import ProjLSTMCell
    B, D, H, P = 2, 3, 8, 4
    cell = ProjLSTMCell(features=H, proj_dim=P, in_dim=D)
    carry = cell.initial_carry(B, jnp.float32)
    x = jnp.ones((B, D))
    params = cell.init(jax.random.key(0), carry, x)
    (c, h), out = cell.apply(params, carry, x)
    assert c.shape == (B, H) and h.shape == (B, P) and out.shape == (B, P)
