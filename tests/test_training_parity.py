"""Training-dynamics parity vs torch: same weights, same batches, same
masks -> the LOSS TRAJECTORY over 10 optimizer steps must match.

Round-1 pinned single-forward numerics (test_bert_golden) and each loss in
isolation (test_losses_masking); this test closes the remaining gap
(round-1 VERDICT item 3): the full train step -- 3-pass forward, joint
loss (ref MMBertForPretraining.py:392-448, bug-fixed semantics per
SURVEY.md section 7), backward, AdamW update -- evolves identically in
torch and in this framework.

The torch twin is built from ``transformers.BertForPreTraining`` (the
reference's own backbone) plus hand-rolled joint/fusion/CPC heads; the
backbone weights flow torch -> jax through models/weights.py (the real
import path) and the extra heads jax -> torch.  Dropout is 0 so the only
stochasticity (MLM masks, AP pairing) is precomputed once on the host and
fed to both sides.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from msa_tpu.configs import MMBertConfig, tiny_bert_config
from msa_tpu.models.mmbert import init_mmbert_params, mmbert_forward, mmbert_loss
from msa_tpu.models.weights import load_pretrained_bert
from msa_tpu.training.optim import decay_mask

B, L, VOCAB, HID, VDIM, SDIM = 8, 16, 128, 32, 5, 7
STEPS = 10
LR, WD = 1e-3, 0.01
ALPHA, BETA = 0.4, 0.7
MASK_ID = 4
IGNORE = -100


# ---------------------------------------------------------------------------
# configs / data
# ---------------------------------------------------------------------------

def jax_config() -> MMBertConfig:
    bert = dataclasses.replace(
        tiny_bert_config(hidden_size=HID, vocab_size=VOCAB),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return MMBertConfig(bert=bert, visual_dim=VDIM, speech_dim=SDIM,
                        num_labels=1, alpha=ALPHA, beta=BETA,
                        joint_dropout_prob=0.0)


def torch_backbone():
    cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=96, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, attn_implementation="eager")
    torch.manual_seed(0)
    return transformers.BertForPreTraining(cfg)


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(10, VOCAB, (B, L)).astype(np.int64)
    views = []
    for _ in range(3):  # text / text+visual / text+speech MLM views
        masked = ids.copy()
        labels = np.full((B, L), IGNORE, np.int64)
        pos = rng.random((B, L)) < 0.15
        pos[:, 0] = False  # leave the CLS slot alone
        masked[pos] = MASK_ID
        labels[pos] = ids[pos]
        views.append((masked, labels))
    visual = rng.standard_normal((B, L, VDIM)).astype(np.float32) + 0.1
    speech = rng.standard_normal((B, L, SDIM)).astype(np.float32) + 0.1
    ap_v = rng.integers(0, 2, (B,)).astype(np.int64)
    ap_s = rng.integers(0, 2, (B,)).astype(np.int64)
    sentiment = rng.uniform(-1, 1, (B,)).astype(np.float32)
    return ids, views, visual, speech, ap_v, ap_s, sentiment


# ---------------------------------------------------------------------------
# torch twin of mmbert_forward + mmbert_loss (bug-fixed ref semantics)
# ---------------------------------------------------------------------------

class TorchTwin(torch.nn.Module):
    def __init__(self, model):
        super().__init__()
        self.model = model
        torch.manual_seed(1)
        self.wv = torch.nn.Linear(VDIM, HID)
        self.ws = torch.nn.Linear(SDIM, HID)
        self.joint_ln = torch.nn.LayerNorm(HID, eps=1e-12)
        self.align = torch.nn.Linear(HID, 2)
        self.attn = torch.nn.Linear(2 * HID, HID)
        self.vt = torch.nn.Linear(HID, 1)
        self.vv = torch.nn.Linear(HID, 1)
        self.vs = torch.nn.Linear(HID, 1)
        self.c1 = torch.nn.Linear(3 * HID, HID)
        self.c2 = torch.nn.Linear(HID, 1)
        self.zt = torch.nn.Linear(HID, HID)
        self.zv = torch.nn.Linear(HID, HID)
        self.za = torch.nn.Linear(HID, HID)

    def encode(self, x, mask2):
        ext = (1.0 - mask2)[:, None, None, :] * -10000.0
        enc = self.model.bert.encoder(x, attention_mask=ext).last_hidden_state
        return enc, self.model.bert.pooler(enc)

    def joint_pass(self, ids, mask, feats, proj):
        emb = self.model.bert.embeddings(input_ids=ids)
        pair = torch.relu(proj(feats))
        x = self.joint_ln(torch.cat([emb, pair], dim=1))
        frame_mask = (feats.abs() > 0).any(-1).float()
        m2 = torch.cat([mask, frame_mask], dim=1)
        enc, pooled = self.encode(x, m2)
        return enc, pooled

    def infonce(self, x, x_pred):
        x = x / x.norm(dim=1, keepdim=True).clamp_min(1e-12)
        x_pred = x_pred / x_pred.norm(dim=1, keepdim=True).clamp_min(1e-12)
        pos = (x * x_pred).sum(-1)
        neg = torch.logsumexp(x @ x_pred.t(), dim=-1)
        return -(pos - neg).mean()

    def forward(self, t_ids, mask, tv_ids, ts_ids, visual, speech,
                t_lab, tv_lab, ts_lab, ap_v, ap_s, sentiment):
        ce = torch.nn.CrossEntropyLoss(ignore_index=IGNORE)
        # text pass
        emb_t = self.model.bert.embeddings(input_ids=t_ids)
        seq_t, pooled_t = self.encode(emb_t, mask)
        mlm_t = ce(self.model.cls.predictions(seq_t).view(-1, VOCAB),
                   t_lab.view(-1))
        # joint passes; pair half unsupervised (-100), deviation (f)
        pad = torch.full((B, L), IGNORE, dtype=torch.long)
        seq_v, pooled_v = self.joint_pass(tv_ids, mask, visual, self.wv)
        seq_s, pooled_s = self.joint_pass(ts_ids, mask, speech, self.ws)
        mlm_v = ce(self.model.cls.predictions(seq_v).view(-1, VOCAB),
                   torch.cat([tv_lab, pad], 1).view(-1))
        mlm_s = ce(self.model.cls.predictions(seq_s).view(-1, VOCAB),
                   torch.cat([ts_lab, pad], 1).view(-1))
        mlm = (mlm_t + mlm_v + mlm_s) / 3
        ap = (ce(self.align(seq_v[:, 0]), ap_v)
              + ce(self.align(seq_s[:, 0]), ap_s)) / 2
        # gated fusion + tanh-squashed MSE (num_labels=1)
        gate = lambda pool, g: g(torch.relu(self.attn(torch.cat([pool, pool], 1))))
        fused = torch.cat([pooled_t * gate(pooled_t, self.vt),
                           pooled_v * gate(pooled_v, self.vv),
                           pooled_s * gate(pooled_s, self.vs)], dim=1)
        temp = self.c1(fused)
        preds = torch.tanh(self.c2(temp))
        label_loss = torch.nn.MSELoss()(preds.view(-1), sentiment)
        nce = (self.infonce(pooled_t, self.zt(temp))
               + self.infonce(pooled_v, self.zv(temp))
               + self.infonce(pooled_s, self.za(temp)))
        loss = ALPHA * mlm + ap + label_loss - BETA * nce
        return {"loss": loss, "mlm_loss": mlm, "ap_loss": ap,
                "label_loss": label_loss, "nce": nce,
                "predictions": preds.view(-1)}


def copy_heads_jax_to_torch(params, twin):
    """The non-backbone heads keep their jax init; mirror them into torch."""
    def lin(jp, m):
        m.weight.data = torch.tensor(np.asarray(jp["kernel"]).T.copy())
        m.bias.data = torch.tensor(np.asarray(jp["bias"]).copy())

    lin(params["joint"]["Wv"], twin.wv)
    lin(params["joint"]["Ws"], twin.ws)
    twin.joint_ln.weight.data = torch.tensor(np.asarray(params["joint"]["ln"]["scale"]).copy())
    twin.joint_ln.bias.data = torch.tensor(np.asarray(params["joint"]["ln"]["bias"]).copy())
    lin(params["cls"]["align"], twin.align)
    f = params["fusion"]
    for name in ("attn", "vt", "vv", "vs"):
        lin(f[name], getattr(twin, name))
    lin(f["classifier1"], twin.c1)
    lin(f["classifier2"], twin.c2)
    lin(params["cpc"]["zt"], twin.zt)
    lin(params["cpc"]["zv"], twin.zv)
    lin(params["cpc"]["za"], twin.za)


def torch_optimizer(twin):
    decay, no_decay = [], []
    for name, p in twin.named_parameters():
        if name.endswith(".bias") or "LayerNorm" in name or "joint_ln" in name:
            no_decay.append(p)
        else:
            decay.append(p)
    return torch.optim.AdamW(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR, betas=(0.9, 0.999), eps=1e-6)


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

def test_ten_step_loss_trajectory_matches_torch():
    import optax

    cfg = jax_config()
    twin = TorchTwin(torch_backbone())

    # identical weights: backbone torch -> jax via the real import path...
    sd = {k: v.detach().numpy() for k, v in twin.model.state_dict().items()}
    params = init_mmbert_params(jax.random.key(0), cfg)
    params = load_pretrained_bert(sd, cfg, params)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    # ...and the framework-init heads jax -> torch
    copy_heads_jax_to_torch(params, twin)

    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-6, weight_decay=WD,
                     mask=decay_mask)
    opt_state = tx.init(params)
    topt = torch_optimizer(twin)

    @jax.jit
    def step(params, opt_state, t_ids, mask, tv_ids, ts_ids, visual, speech,
             t_lab, tv_lab, ts_lab, ap_v, ap_s, sentiment):
        def loss_fn(p):
            out = mmbert_forward(p, t_ids, mask, tv_ids, ts_ids, visual,
                                 speech, cfg, deterministic=True,
                                 compute_dtype=jnp.float32, mlm_scores=True,
                                 use_flash="never")
            losses = mmbert_loss(p, out, t_lab, tv_lab, ts_lab, ap_v, ap_s,
                                 sentiment, cfg)
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    jax_traj, torch_traj = [], []
    components = ("loss", "mlm_loss", "ap_loss", "label_loss", "nce")
    for i in range(STEPS):
        ids, views, visual, speech, ap_v, ap_s, sentiment = make_batch(seed=i)
        mask = np.ones((B, L), np.int32)
        (t_ids, t_lab), (tv_ids, tv_lab), (ts_ids, ts_lab) = views

        params, opt_state, jl = step(
            params, opt_state, jnp.asarray(t_ids, jnp.int32),
            jnp.asarray(mask), jnp.asarray(tv_ids, jnp.int32),
            jnp.asarray(ts_ids, jnp.int32), jnp.asarray(visual),
            jnp.asarray(speech), jnp.asarray(t_lab, jnp.int32),
            jnp.asarray(tv_lab, jnp.int32), jnp.asarray(ts_lab, jnp.int32),
            jnp.asarray(ap_v, jnp.int32), jnp.asarray(ap_s, jnp.int32),
            jnp.asarray(sentiment))
        jax_traj.append({k: float(jl[k]) for k in components})

        topt.zero_grad()
        tl = twin(torch.tensor(t_ids), torch.tensor(mask, dtype=torch.float32),
                  torch.tensor(tv_ids), torch.tensor(ts_ids),
                  torch.tensor(visual), torch.tensor(speech),
                  torch.tensor(t_lab), torch.tensor(tv_lab),
                  torch.tensor(ts_lab), torch.tensor(ap_v),
                  torch.tensor(ap_s), torch.tensor(sentiment))
        tl["loss"].backward()
        topt.step()
        torch_traj.append({k: float(tl[k].detach()) for k in components})

    # step 0: identical weights -> tight agreement on every component
    for k in components:
        assert jax_traj[0][k] == pytest.approx(torch_traj[0][k], abs=2e-5), \
            (k, jax_traj[0], torch_traj[0])
    # full trajectory: f32 roundoff accumulates through 10 AdamW updates
    for i in range(STEPS):
        for k in components:
            assert jax_traj[i][k] == pytest.approx(
                torch_traj[i][k], rel=2e-3, abs=2e-3), \
                (i, k, jax_traj[i], torch_traj[i])
    # the trajectory actually moved (the optimizer stepped; ref bug (a) fixed)
    assert abs(jax_traj[-1]["loss"] - jax_traj[0]["loss"]) > 1e-3
