"""Forward parity vs an eager-PyTorch mirror of the reference architecture.

Builds torch modules with the reference's exact structure (EncoderLstm /
DecoderFC / Discriminator, train.py:245-335), loads OUR parameters into
them, and checks that the full generator rollout and discriminator outputs
agree — the strongest wiring-parity evidence short of running the CUDA
reference itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from socialways_tpu.config import TrainConfig  # noqa: E402
from socialways_tpu.models import (  # noqa: E402
    discriminator_apply,
    generator_rollout,
    init_discriminator,
    init_generator,
)
from socialways_tpu.ops.traj import get_traj_4d  # noqa: E402

H = 32
CFG = TrainConfig(hidden_size=H, social_feature_size=H, noise_len=H // 2,
                  n_past=8, n_next=12)


def _t(x):
    return torch.from_numpy(np.asarray(x).copy())


def _load_linear(mod: nn.Linear, p) -> None:
    with torch.no_grad():
        mod.weight.copy_(_t(p["w"]).T)
        mod.bias.copy_(_t(p["b"]))


def _load_lstm(mod: nn.LSTM, p, in_dim: int) -> None:
    w = np.asarray(p["w"])
    with torch.no_grad():
        mod.weight_ih_l0.copy_(_t(w[:in_dim].T))
        mod.weight_hh_l0.copy_(_t(w[in_dim:].T))
        mod.bias_ih_l0.copy_(_t(p["b"]))
        mod.bias_hh_l0.zero_()


class TorchGenerator(nn.Module):
    """Reference EncoderLstm + DecoderFC + predict() loop
    (train.py:245-269, 320-335, 392-432)."""

    def __init__(self):
        super().__init__()
        d = H + H + H // 2
        self.embed = nn.Linear(4, H)
        self.lstm = nn.LSTM(H, H, batch_first=True)
        self.fc1 = nn.Sequential(
            nn.Linear(d, d), nn.LeakyReLU(0.2),
            nn.Linear(d, d // 2), nn.LeakyReLU(0.2),
            nn.Linear(d // 2, d // 4), nn.Linear(d // 4, 2))

    def predict(self, obsv_p, noise, n_next):
        bs = obsv_p.shape[0]
        v = obsv_p[:, 1:] - obsv_p[:, :-1]
        v = torch.cat([v[:, :1], v], dim=1)
        obsv_4d = torch.cat([obsv_p, v], dim=2)
        _, (h, c) = self.lstm(self.embed(obsv_4d))
        s = torch.zeros(bs, H)
        last = obsv_p[:, -1]
        outs = []
        for _ in range(n_next):
            new_v = self.fc1(torch.cat([h[0], s, noise], dim=1))
            new_p = new_v + last
            step4 = torch.cat([new_p, new_v], dim=1)
            _, (h, c) = self.lstm(self.embed(step4).unsqueeze(1), (h, c))
            last = new_p
            outs.append(step4)
        return torch.stack(outs, 1)


class TorchDiscriminator(nn.Module):
    """Reference Discriminator (train.py:272-309)."""

    def __init__(self, n_next, n_codes):
        super().__init__()
        self.n_next = n_next
        self.obsv_encoder_lstm = nn.LSTM(4, H, batch_first=True)
        self.obsv_encoder_fc = nn.Sequential(
            nn.Linear(H, H // 2), nn.LeakyReLU(0.2),
            nn.Linear(H // 2, H // 2))
        self.pred_encoder = nn.Sequential(
            nn.Linear(n_next * 4, H // 2), nn.LeakyReLU(0.2),
            nn.Linear(H // 2, H // 2))
        self.classifier = nn.Sequential(
            nn.Linear(H, H // 2), nn.LeakyReLU(0.2), nn.Linear(H // 2, 1))
        self.latent_decoder = nn.Sequential(
            nn.Linear(H, H // 2), nn.LeakyReLU(0.2),
            nn.Linear(H // 2, n_codes))

    def forward(self, obsv, pred):
        y, _ = self.obsv_encoder_lstm(obsv)
        obsv_code = self.obsv_encoder_fc(y[:, -1])
        pred_code = self.pred_encoder(pred.reshape(-1, self.n_next * 4))
        both = torch.cat([obsv_code, pred_code], dim=1)
        return self.classifier(both), self.latent_decoder(both)


def test_generator_rollout_matches_torch_reference():
    params = init_generator(jax.random.PRNGKey(0), CFG)
    tg = TorchGenerator()
    _load_linear(tg.embed, params["embed"])
    _load_lstm(tg.lstm, params["encoder"], H)
    for i, lin in enumerate([tg.fc1[0], tg.fc1[2], tg.fc1[4], tg.fc1[5]]):
        _load_linear(lin, params["decoder"][i])

    rng = np.random.RandomState(0)
    obsv = rng.rand(6, CFG.n_past, 2).astype(np.float32)
    noise = rng.rand(6, CFG.noise_len).astype(np.float32)

    ours = np.asarray(generator_rollout(params, jnp.asarray(obsv),
                                        jnp.asarray(noise), CFG.n_next,
                                        use_social=False))
    with torch.no_grad():
        theirs = tg.predict(_t(obsv), _t(noise), CFG.n_next).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_discriminator_matches_torch_reference():
    params = init_discriminator(jax.random.PRNGKey(1), CFG)
    td = TorchDiscriminator(CFG.n_next, CFG.n_latent_codes)
    _load_lstm(td.obsv_encoder_lstm, params["obsv_lstm"], 4)
    for seq, ps in [(td.obsv_encoder_fc, params["obsv_fc"]),
                    (td.pred_encoder, params["pred_fc"]),
                    (td.classifier, params["classifier"]),
                    (td.latent_decoder, params["latent_dec"])]:
        _load_linear(seq[0], ps[0])
        _load_linear(seq[2], ps[1])

    rng = np.random.RandomState(2)
    obsv = rng.rand(6, CFG.n_past, 2).astype(np.float32)
    pred = rng.rand(6, CFG.n_next, 2).astype(np.float32)
    o4, p4 = get_traj_4d(jnp.asarray(obsv), jnp.asarray(pred))

    label, code = discriminator_apply(params, o4, p4)
    with torch.no_grad():
        tl, tc = td(_t(np.asarray(o4)), _t(np.asarray(p4)))
    np.testing.assert_allclose(np.asarray(label), tl.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(code), tc.numpy(), rtol=1e-4,
                               atol=1e-5)
