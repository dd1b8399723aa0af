"""Recurrent cells vs torch nn.LSTM/nn.GRU — gate-order/bias parity
(SURVEY.md §7.3.3: "the fp32-tolerance clause fails here first")."""

import numpy as np
import torch

from asltpu.ops.recurrent import bilstm, gru_layer, lstm_layer


def _np(t):
    return t.detach().numpy()


def test_lstm_matches_torch():
    torch.manual_seed(0)
    B, T, F, H = 3, 7, 5, 4
    ref = torch.nn.LSTM(F, H, batch_first=True)
    x = torch.randn(B, T, F)
    want, (h_n, c_n) = ref(x)

    params = {
        "wi": _np(ref.weight_ih_l0).T,
        "wh": _np(ref.weight_hh_l0).T,
        "b": _np(ref.bias_ih_l0 + ref.bias_hh_l0),
    }
    got, (h_f, c_f) = lstm_layer(_np(x), params)
    np.testing.assert_allclose(np.asarray(got), _np(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_f), _np(h_n[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_f), _np(c_n[0]), atol=1e-5)


def test_bilstm_matches_torch():
    torch.manual_seed(1)
    B, T, F, H = 2, 6, 5, 4
    ref = torch.nn.LSTM(F, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, F)
    want, _ = ref(x)

    def p(sfx):
        return {
            "wi": _np(getattr(ref, f"weight_ih_l0{sfx}")).T,
            "wh": _np(getattr(ref, f"weight_hh_l0{sfx}")).T,
            "b": _np(getattr(ref, f"bias_ih_l0{sfx}")
                     + getattr(ref, f"bias_hh_l0{sfx}")),
        }

    got = bilstm(_np(x), p(""), p("_reverse"))
    np.testing.assert_allclose(np.asarray(got), _np(want), atol=1e-5)


def test_gru_matches_torch():
    torch.manual_seed(2)
    B, T, F, H = 3, 8, 6, 5
    ref = torch.nn.GRU(F, H, batch_first=True)
    x = torch.randn(B, T, F)
    want, h_n = ref(x)

    params = {
        "wi": _np(ref.weight_ih_l0).T,
        "wh": _np(ref.weight_hh_l0).T,
        "bi": _np(ref.bias_ih_l0),
        "bh": _np(ref.bias_hh_l0),
    }
    got, h_f = gru_layer(_np(x), params)
    np.testing.assert_allclose(np.asarray(got), _np(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_f), _np(h_n[0]), atol=1e-5)
