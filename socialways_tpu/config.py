"""Configuration for training / evaluation.

Replaces the reference's argparse + ~15 hard-coded module constants
(reference: train.py:19-84) with a single dataclass.  Every hard-coded
``FIXME`` flag of the reference (use_info_loss, use_l2_loss, use_variety_loss,
use_social, loss weights, noise length, ...) is a real option here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyper-parameters of the Social-Ways GAN.

    Defaults reproduce the reference defaults (train.py:19-84) except where
    noted.  Frozen so it can be closed over by jitted functions safely.
    """

    # ---- data ----
    dataset: str = "hotel"
    data_file: str = ""          # path to the {obsvs,preds,times,batches} npz
    n_past: int = 8              # set from data at load time
    n_next: int = 12             # set from data at load time

    # ---- optimisation (reference defaults) ----
    batch_size: int = 256        # greedy scene-batch accumulation cap
    n_epochs: int = 1000
    lr_g: float = 1e-4
    lr_d: float = 1e-3
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    grad_clip: float = 0.0       # global-norm clip (0 = off, reference parity)
    # staircase exponential lr decay applied to BOTH optimizers:
    # lr(step) = lr0 * rate^(step // steps).  The reference ships (and
    # never calls) a step-decay helper (utils/learning_utils.py:adjust_
    # learning_rate, lr=0.005*0.6^(epoch//50)); this is its working form.
    lr_decay_rate: float = 1.0   # 1.0 = constant lr (reference behavior)
    lr_decay_steps: int = 0      # optimizer updates per decay stair
    # D-only staircase lr decay — overrides the shared schedule for the D
    # optimizer when d_lr_decay_steps > 0.  Cooling only the discriminator
    # is a classic two-time-scale stabilizer for the divergence cliffs the
    # info-weight sweeps exposed (BASELINE.md); G keeps the shared schedule.
    d_lr_decay_rate: float = 1.0
    d_lr_decay_steps: int = 0
    # D/G update-ratio schedule: run the D phase only on every k-th GAN
    # step (the step counter is the number of completed G updates, read
    # from the G optimizer's Adam count).  On skipped steps D params and
    # optimizer state are untouched and G trains against the CURRENT D
    # (no unroll lookahead).  1 = reference parity (D every step).
    d_update_every: int = 1
    # warmup-style D/G ratio SCHEDULE: after d_update_every_switch G
    # steps, the ratio changes from d_update_every to d_update_every_end
    # (e.g. 1 → 2: full D updates early while D learns the data manifold,
    # then relax).  0 = disabled (constant ratio).
    d_update_every_end: int = 0
    d_update_every_switch: int = 0
    # linear lr warmup over the first N optimizer updates (0 = off,
    # reference parity).  Composes with the staircase decays above;
    # d_lr_warmup_steps overrides the D optimizer's warmup when > 0.
    lr_warmup_steps: int = 0
    d_lr_warmup_steps: int = 0
    # exponential moving average of generator params, updated after every
    # G step: ema = d·ema + (1-d)·params.  0 = off.  When on, evaluation,
    # dumps, and checkpoint-best selection read the EMA generator — the
    # classic GAN variance reducer (the raw params keep training).
    g_ema_decay: float = 0.0

    # ---- architecture ----
    hidden_size: int = 64
    # The reference exposes n_layers on EncoderLstm (train.py:247) but its
    # decoder consumes lstm_h[0].view(bs,-1) (train.py:421), which only
    # type-checks for 1 layer — n_layers>1 is broken in the reference and
    # unsupported here (validated at init).
    n_lstm_layers: int = 1
    num_social_features: int = 3
    social_feature_size: int = 64    # = hidden_size in the reference
    noise_len: int = 32              # = hidden_size // 2 in the reference
    latent_dim: int = 10             # reference flag --latent-dim (unused there too)
    decoder: str = "fc"              # "fc" (reference default) | "lstm"

    # ---- GAN variants ----
    n_unrolling_steps: int = 1
    use_info_loss: bool = True
    loss_info_w: float = 0.5
    # Info-weight SCHEDULE: ramp the InfoGAN weight linearly from
    # loss_info_w to loss_info_w_end over loss_info_w_steps GAN steps
    # (then hold).  Mechanism-driven lever for the transient global
    # one-mode dips (benchmarks/dip_diagnosis*): the dips are G-side
    # code→mode REMAPS (Q accuracy stays 1.0, D margins stay modest,
    # the code map flips with one mode share collapsing) — raising the
    # info anchor as training progresses makes migrating an established
    # code→mode assignment increasingly expensive while leaving early
    # exploration free.  0 = no schedule (reference parity).
    loss_info_w_end: float = 0.0
    loss_info_w_steps: int = 0
    n_latent_codes: int = 2
    # "continuous" (reference parity): Q-head regresses the first
    # n_latent_codes noise dims with MSE (train.py:485,516).
    # "categorical": classic InfoGAN — a uniform categorical code
    # one-hot-embedded in the first n_latent_codes noise dims, Q-head
    # trained with softmax cross-entropy; the right inductive bias when the
    # target distribution has discrete modes (the toy's 3 turn modes).
    latent_code_type: str = "continuous"
    # the reference draws noise from U(0,1) — not the usual N(0,1)
    # (train.py:473, torch.rand); "gaussian" is the standard alternative,
    # exposed as a flagged divergence
    noise_dist: str = "uniform"
    use_l2_loss: bool = False
    use_variety_loss: bool = False
    loss_l2_w: float = 0.5
    variety_k: int = 20
    # Reference restores only nn.Linear weights of D after unrolling
    # (train.py:311-316 — LSTM weights leak). "full" fixes that bug;
    # "reference" replicates it; "none" keeps the unrolled D.
    d_restore: str = "full"
    # R1 gradient penalty on the real-data D output (Mescheder et al.
    # 2018): + r1_gamma/2 · E‖∇_pred D(obsv, pred_real)‖².  0 = off
    # (reference behavior).  A stability knob for the divergence cliffs
    # the info-weight sweeps exposed (BASELINE.md).
    r1_gamma: float = 0.0
    # D instance noise (Sønderby et al. 2017 / Arjovsky & Bottou 2017):
    # Gaussian noise of std d_input_noise added to the PREDICTION inputs
    # of every D evaluation (fake and real futures alike; the shared
    # observation branch stays clean) — overlaps the real/fake supports so
    # D's decision boundary can't sharpen onto single modes.  With
    # d_input_noise_steps > 0 the std decays linearly over that many GAN
    # steps (the classic anneal); 0 keeps it constant.  0.0 = off
    # (reference parity).  d_input_noise_floor clamps the annealed std
    # from below — the round-4 LOO A/B showed the anneal-to-zero wins the
    # easy folds while a constant floor is what prevents the hard fold's
    # late D-overfit divergence (BASELINE.md "LOO stabilizer A/B"); the
    # floor composes both.  Ignored without an anneal (constant mode
    # already IS a floor).
    d_input_noise: float = 0.0
    d_input_noise_steps: int = 0
    d_input_noise_floor: float = 0.0
    # Spectral normalization of D's feed-forward Linear weights (SN-GAN,
    # Miyato et al. 2018): every evaluation divides each FC ``w`` by its
    # top singular value (stateless power iteration — see
    # models.discriminator.spectral_normalize_d for what is and isn't
    # normalized).  Bounds D's Lipschitz constant, the classic alternative
    # to instance noise for keeping D's boundary from sharpening onto
    # single modes.  False = off (reference parity).
    spectral_norm: bool = False
    # PacGAN (Lin et al. 2018): the LSGAN classifier head scores PACKS of
    # `pac` consecutive samples (their concatenated obsv+pred codes) with
    # one real/fake label per pack — mode collapse becomes directly
    # visible to D as low within-pack diversity.  Rows are scene-sorted,
    # so packs are same-scene/condition — exactly the axis the toy's
    # coverage metric measures.  The InfoGAN Q-head stays per-sample.
    # Requires batch rows divisible by pac (padded batches are).  1 = off
    # (reference parity).
    pac: int = 1
    # Minibatch stddev (ProGAN, Karras et al. 2018 §3): one scalar — the
    # feature-mean std of the fake (resp. real) block's flattened futures,
    # masked, DP-global — appended to the classifier input so D can see
    # "this generator's batch has collapsed" directly; the G phase
    # differentiates through the fake block's statistic, giving G explicit
    # diversity pressure.  The Q-head never sees it.  Under --grad-accum
    # the statistic is per micro-chunk (like any batch statistic), so the
    # accumulation equals a full batch whose statistic is chunk-local —
    # documented deviation from the exact-accumulation claim.  False = off
    # (reference parity).
    mb_std: bool = False
    # Mode-seeking regularizer (MSGAN, Mao et al. CVPR 2019): the G loss
    # adds  ms_weight / (r + 1e-5)  with  r = E|G(z1)−G(z2)| / E|z1−z2|
    # (masked row means; positions only; z2 a fresh draw from the same
    # noise distribution).  Collapsed generators map distant z to nearby
    # trajectories → small r → large penalty, so G gets direct pressure to
    # keep distinct latents on distinct modes.  Differs from the
    # reference's variety loss (min-of-K L2 to ground truth, measured
    # negative here): mode seeking needs no ground-truth future and pushes
    # pairwise output diversity instead of best-sample accuracy.  Costs
    # one extra rollout per G step.  0.0 = off (reference parity).
    ms_weight: float = 0.0
    # Diversity-sensitive hinge (DSGAN, Yang et al. ICLR 2019): the G loss
    # adds  ds_weight · E_i max(0, ds_tau − d_i/dz_i)  with
    # d_i = mean|G_i(z1)−G_i(z2)| per SAMPLE (same observation, two noise
    # draws) and dz_i = mean|z1_i−z2_i|.  The per-sample form is the
    # sharp version of mode seeking: a few collapsed condition-modes are
    # diluted to invisibility in ms_weight's GLOBAL ratio, but each
    # collapsed row pays the full hinge here — and the hinge bounds the
    # term (no 1/r blow-up), going silent once per-condition diversity
    # clears ds_tau.  Shares the second rollout with ms_weight when both
    # are on.  0.0 = off (reference parity).
    ds_weight: float = 0.0
    ds_tau: float = 1.0
    # number of rollouts pooled by the diversity regularizers: d_i/dz_i
    # become the mean over all K(K−1)/2 pairs of K draws (K−1 extra
    # rollouts).  At K=2 a healthy 3-mode generator still lands both
    # draws on the SAME mode ~1/3 of the time (small d_i, hinge fires on
    # legitimate rows); at K=4 the all-same-mode probability drops to
    # ~4% and the per-row statistic separates collapse cleanly.
    ds_k: int = 2
    use_social: bool = False     # reference default (train.py:83) — paper's
                                 # attention is OFF by default; expose both.
    # Agent-centric canonical frames (standard in the trajectory
    # literature; no reference counterpart): every trajectory is rotated/
    # translated into its own heading frame (origin = last observed point,
    # +x = heading) before the model sees it, and rollouts are mapped back
    # to world coordinates at the eval boundary.  Training (G, D, Q,
    # losses) runs entirely in canonical coordinates — rotation+
    # translation is an isometry, so every L2 loss value is exactly the
    # world-frame value.  The payoff is structural: code→mode structure is
    # learned ONCE and shared across approach directions, so
    # per-condition mode collapse (one direction losing a mode while the
    # others keep it) cannot happen without global collapse.
    # Composes with use_social: the pairwise social geometry (distance,
    # bearing, DCA — relational quantities needing one shared frame) is
    # computed from WORLD-frame last-obs states captured before
    # canonicalization, while the attention pools the CANONICAL encoder
    # states h_j (heading-invariant motion descriptors — there is no
    # natural rotation action on an LSTM hidden state, so rotating h_j
    # is not an option).  The composed model stays equivariant under
    # global isometries (tests/test_agent_frame.py).
    # False = off (reference parity).
    agent_frame: bool = False

    # ---- evaluation ----
    n_gen_samples: int = 20      # K for min-of-K ADE/FDE
    test_interval: int = 5       # epochs between eval runs
    save_interval: int = 50      # epochs between checkpoints

    # ---- runtime ----
    seed: int = 0
    dtype: str = "float32"       # parameter / optimizer (master) dtype
    # forward-pass dtype: "bfloat16" runs generator + discriminator forward
    # math on the MXU in bf16 (f32 accumulation, f32 losses/optimizer —
    # master params stay `dtype`); "float32" (default) is exact reference
    # parity
    compute_dtype: str = "float32"
    use_pallas: bool = False     # fused social-attention kernel (TPU only):
                                 # on-device 1.2-5.7x vs XLA and the only
                                 # form that fits HBM at 10k agents
    # (a pallas_decode flag existed through round 2; the fused decode
    # kernel lost to XLA decode in every regime, including inside the
    # fused crowd-simulate program — benchmarks/decode_kernel_ab.json —
    # and was removed)
    # rematerialize the per-step LSTM/decoder computations during TRAINING
    # (value-identical; backward recomputes each step once).  Cuts the
    # rollout + encoder + D-observation residuals from ~36 KB/agent (every
    # intermediate of the unrolled 8-step encoders and 12-step decode) to
    # the scan carries — the lever for crowd-scale training (required
    # above ~262k agents/chip); a few % slower below, so off by default.
    remat_steps: bool = False
    # do NOT share one rollout vjp between the D and G phases: the D phase
    # sees a forward-only (residual-free) rollout and the G phase
    # recomputes the rollout under grad AFTER the D phase finishes, so the
    # rollout's backward residuals and the D phase's residuals are never
    # live together.  ~2x rollout compute per step, but peak HBM becomes
    # max(D residuals, G residuals) instead of their sum — the lever for
    # the largest one-chip crowd TRAINING sizes (with remat_steps +
    # max_scene_size).  Off by default (the shared-vjp form is faster).
    serial_rollout: bool = False
    # static bound on rows-per-scene (scene ids sorted + contiguous).
    # >0 unlocks the windowed O(N·max_scene) attention above the fused
    # kernel's VMEM cap — linear in N, the path to million-agent crowds.
    # 0 = unknown (falls back to the O(N²) blockwise stream at scale).
    max_scene_size: int = 0
    # exact gradient accumulation: split the batch's rows into grad_accum
    # equal micro-chunks and lax.scan the D/G loss gradients over them,
    # weighting each chunk's gradient by its valid-row share — bit-for-math
    # equal (up to float reassociation) to the full-batch masked-mean
    # gradient, but peak HBM residuals shrink to ONE chunk's (XLA frees
    # each scan iteration's vjp residuals) — the lever past the 524k
    # one-chip crowd-training wall.  Requires batch rows divisible by
    # grad_accum and scene boundaries aligned to chunk boundaries (social
    # attention never crosses chunks; uniform-scene crowd batches satisfy
    # this when rows/grad_accum is a multiple of the scene size).  Implies
    # serial-rollout semantics (the fake rollout runs forward-only for the
    # D phase and is recomputed under grad per chunk in the G phase).
    # 1 = off (reference parity path).
    grad_accum: int = 1
    mesh_shape: Optional[int] = None  # devices on the 'data' axis (None = all)
    epoch_on_device: bool = True      # lax.scan over packed batches

    # ---- io ----
    model_dir: str = "trained_models"
    dump_dir: str = ""           # prediction npz dump directory ("" = off)
    # linear baseline written to the dumps' ``preds_lnr`` field and used by
    # `evaluate --linear` when no explicit choice is given: "cv" (constant
    # velocity — reference parity, utils/linear_models.py:9-20) or
    # "kalman" (ops/kalman.py — the reference's commented-out MyKalman
    # rebuilt live; beats CV on curved tracks, tests/test_ops.py)
    lnr_model: str = "cv"

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    @property
    def decoder_input(self) -> int:
        return self.hidden_size + self.social_feature_size + self.noise_len
