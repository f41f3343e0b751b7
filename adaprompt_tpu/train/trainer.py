"""Training orchestration — the host-side iteration state machine.

Plays the role of main.py + pytorch-lightning + DDPM.training_step in the
reference (ddpm.py:484-638): per step the host picks the iteration type

    every `composition_regs_iter_gap` steps -> compositional distill iter
    else normal recon; with prob `arc2face_distill_iter_prob` -> Arc2Face
    distill iter   (v1-finetune-ada.yaml:32-35)

and invokes the matching compiled step function. Gradient accumulation is
optax.MultiSteps (the reference's manual_accumulate_grad_batches,
ddpm.py:606-633), gradient clipping optax.clip_by_global_norm(0.5)
(grad_clip, yaml:60), the optimizer Prodigy with the warmup+linear-decay
schedule, all inside the jitted steps.

Metrics stream to a jsonl file (the reference's loss_dict/wandb role);
checkpoints are native npz snapshots of the trainable pytree (the
embeddings_gs-*.pt role).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from adaprompt_tpu.adaface import arc2face as a2f
from adaprompt_tpu.adaface import checkpoint as ckpt_mod
from adaprompt_tpu.adaface import conditioner as cond_mod
from adaprompt_tpu.adaface import subj_basis_generator as sbg
from adaprompt_tpu.models import clip_text, unet as unet_mod, vae as vae_mod
from adaprompt_tpu.sampling.schedule import SD15_SCHEDULE, q_sample
from adaprompt_tpu.train import steps as steps_mod
from adaprompt_tpu.train.losses import calc_recon_loss
from adaprompt_tpu.train.lr_schedules import prodigy_lr_schedule
from adaprompt_tpu.train.prodigy import prodigy


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 120_000
    grad_accum: int = 2                      # manual_accumulate_grad_batches
    grad_clip: float = 0.5
    optimizer_type: str = "Prodigy"          # Prodigy | AdamW
    d_coef: float = 2.0
    prodigy_betas: tuple = (0.9, 0.999)      # zs_betas (yaml:76)
    warm_up_steps: int = 500
    scheduler_cycles: int = 1
    base_lr: float = 8e-4                    # AdamW path only
    composition_regs_iter_gap: int = 3
    arc2face_distill_iter_prob: float = 0.1
    num_denoising_steps_range: tuple = (1, 3, 5, 7)
    skip_weights: tuple = (0.5, 0.5)         # training clip-skip base weights
    randomize_clip_skip: bool = True         # Dirichlet-sampled per iter
    seed: int = 0
    ckpt_every: int = 500
    out_dir: str = "runs/adaprompt"
    compute_dtype: str = "bfloat16"


def build_optimizer(cfg: TrainerConfig):
    if cfg.optimizer_type == "Prodigy":
        sched = prodigy_lr_schedule(cfg.max_steps, cfg.warm_up_steps,
                                    cfg.scheduler_cycles)
        tx = prodigy(lr=sched, betas=cfg.prodigy_betas, d_coef=cfg.d_coef,
                     use_bias_correction=True,
                     safeguard_warmup=cfg.scheduler_cycles > 1)
    elif cfg.optimizer_type == "AdamW":
        from adaprompt_tpu.train.lr_schedules import lambda_warmup_cosine_schedule
        sched = lambda_warmup_cosine_schedule(500, 0.01, 1.0, 0.1, cfg.max_steps)
        tx = optax.adamw(lambda step: cfg.base_lr * sched(step),
                         b1=0.9, b2=0.993)
    else:
        raise ValueError(cfg.optimizer_type)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def make_zs_recon_step(optimizer, frozen: steps_mod.FrozenSD, tokenizer,
                       subj_basis_cfg, *, num_ca_layers: int = 16,
                       sched=SD15_SCHEDULE, compute_dtype=jnp.bfloat16):
    """Zero-shot reconstruction iter: the trainable SubjBasisGenerator
    produces the subject embeddings spliced into the caption prompt; the
    frozen SD UNet reconstructs the noised training latents
    (ddpm.py:2896-2950 recon path under zero-shot conditioning).

    batch: {'z0', 'faceid', 'caption_ids' [B,77], 'subj_bi' [B],
            'subj_pos' [B], 'fg_mask', 'aug_mask', 'skip_weights' [N]}.
    """
    K = subj_basis_cfg.num_out_embs_per_layer

    def loss_fn(trainable, batch, key):
        z0 = batch["z0"]
        b = z0.shape[0]
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(kn, z0.shape, jnp.float32)

        _, core_id = a2f.forward_face_embs(
            frozen.arc2face_text, tokenizer, batch["faceid"],
            text_cfg=frozen.arc2face_text_cfg, input_max_length=21)
        core_id = jax.lax.stop_gradient(core_id)

        subj_embs, _ = sbg.forward(trainable["subj_basis"], subj_basis_cfg,
                                   tokenizer, core_id, is_training=True)
        # zero-shot subject branch repeats the core embs over layers —
        # use the L'=1 fast path
        ctx = cond_mod.encode_spliced(
            frozen.text, batch["caption_ids"],
            [(subj_embs[:, :1], batch["subj_bi"], batch["subj_pos"], K)],
            batch["skip_weights"], num_ca_layers, frozen.text_cfg)

        z_t = q_sample(sched, z0, t, noise)
        eps = unet_mod.forward(frozen.unet, z_t.astype(compute_dtype), t,
                               ctx.astype(compute_dtype),
                               cfg=frozen.unet_cfg).astype(jnp.float32)
        loss = calc_recon_loss(eps, noise, batch.get("aug_mask"),
                               batch.get("fg_mask"), fg_pixel_weight=1.0,
                               bg_pixel_weight=0.1)
        return loss, {"loss_recon": loss}

    def step(state, batch, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return steps_mod.TrainState(params, opt_state, state.step + 1), metrics

    return step


class AdaPromptTrainer:
    """Host loop: iteration-type state machine + batch prep + logging."""

    def __init__(self, frozen: steps_mod.FrozenSD, vae_params, vae_cfg,
                 tokenizer, subj_basis_cfg, sbg_params,
                 batch_iterator, cfg: TrainerConfig,
                 face_embedder=None, subject_spec=None, clip_scorer=None,
                 num_candidate_teachers: int = 2):
        # clip_scorer: optional eval.clip_scorer.CLIPScorer for compositional
        # teacher filtering (do_clip_teacher_filtering, yaml:31); without it
        # every fresh compositional iteration is treated as teachable.
        self.clip_scorer = clip_scorer
        self.num_candidate_teachers = num_candidate_teachers
        self.mesh = None
        self.frozen = frozen
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.tokenizer = tokenizer
        self.subj_basis_cfg = subj_basis_cfg
        self.cfg = cfg
        self.batch_iterator = batch_iterator
        self.face_embedder = face_embedder
        self.rng = np.random.default_rng(cfg.seed)
        self.key = jax.random.PRNGKey(cfg.seed)
        # ca_q_bns running stats (embedding_manager.py:1205-1215 bookkeeping)
        self.ca_q_bn_stats: dict = {}
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        self.subject_spec = subject_spec or cond_mod.make_placeholders(
            tokenizer, ("z",), ("y",),
            num_vectors_subj=subj_basis_cfg.num_out_embs_per_layer)[0]

        self.optimizer = build_optimizer(cfg)
        self.state = steps_mod.create_train_state({"subj_basis": sbg_params},
                                                  self.optimizer)

        self._recon_step = jax.jit(make_zs_recon_step(
            self.optimizer, frozen, tokenizer, subj_basis_cfg,
            compute_dtype=self.dtype))
        self._distill_steps = {}
        self._encode_latents = jax.jit(
            lambda imgs: vae_mod.encode(vae_params, imgs, cfg=vae_cfg)[0] * 0.18215)

        os.makedirs(cfg.out_dir, exist_ok=True)
        self._metrics_file = open(os.path.join(cfg.out_dir, "metrics.jsonl"), "a")

    # -- multi-chip -----------------------------------------------------------

    def distribute(self, mesh=None, fsdp: int = 1):
        """Shard the trainer over a (dp, fsdp) mesh: frozen/trainable params
        FSDP-sharded or replicated, recon batches sharded over dp by
        prepare_recon_batch. GSPMD inserts the gradient all-reduce — the
        reference's 2-GPU DDP generalized to the chip count."""
        from adaprompt_tpu.parallel import mesh as mesh_mod
        self.mesh = mesh or mesh_mod.make_mesh(fsdp=fsdp)
        sp = lambda tree: mesh_mod.shard_params(tree, self.mesh)
        self.frozen = steps_mod.FrozenSD(
            unet=sp(self.frozen.unet), text=sp(self.frozen.text),
            arc2face_text=sp(self.frozen.arc2face_text),
            teacher_unet=sp(self.frozen.teacher_unet)
            if self.frozen.teacher_unet is not None else None,
            unet_cfg=self.frozen.unet_cfg, text_cfg=self.frozen.text_cfg,
            arc2face_text_cfg=self.frozen.arc2face_text_cfg)
        self.vae_params = sp(self.vae_params)
        self.state = steps_mod.TrainState(
            params=sp(self.state.params),
            opt_state=jax.tree.map(
                lambda x: x if not hasattr(x, "shape") else
                mesh_mod.replicate(x, self.mesh), self.state.opt_state),
            step=self.state.step)
        # rebuild jitted fns against the sharded frozen params
        self._recon_step = jax.jit(make_zs_recon_step(
            self.optimizer, self.frozen, self.tokenizer, self.subj_basis_cfg,
            compute_dtype=self.dtype))
        self._distill_steps = {}
        for attr in ("_compos_phase", "_filter_phase", "_filter_ctx_fn"):
            if hasattr(self, attr):
                delattr(self, attr)
        return self.mesh

    def _shard_batch(self, batch: dict) -> dict:
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = NamedSharding(self.mesh, P("dp"))
        rep = NamedSharding(self.mesh, P())
        out = {}
        for k, v in batch.items():
            if v is None or not hasattr(v, "shape"):
                out[k] = v
            elif v.ndim >= 1 and v.shape[0] % self.mesh.shape["dp"] == 0 and v.shape[0] > 1:
                out[k] = jax.device_put(v, dp)
            else:
                out[k] = jax.device_put(v, rep)
        return out

    # -- batch prep -------------------------------------------------------------

    def _skip_weights(self):
        base = np.asarray(self.cfg.skip_weights, np.float64)
        if self.cfg.randomize_clip_skip:
            # Dirichlet-sampled clip-skip (encoders/modules.py:412-440)
            w = self.rng.dirichlet(base + 1e-6)
        else:
            w = base / base.sum()
        return jnp.asarray(w, jnp.float32)

    def _latent_mask(self, mask_np):
        m = jnp.asarray(np.asarray(mask_np, np.float32))[..., None]
        f = 2 ** (self.vae_cfg.num_resolutions - 1)
        h, w = m.shape[1] // f, m.shape[2] // f
        from adaprompt_tpu.models.vae import _resize_mask_nearest
        return _resize_mask_nearest(m, (h, w))

    def prepare_recon_batch(self, raw: dict) -> dict:
        imgs = jnp.asarray(raw["image"], self.dtype)
        z0 = self._encode_latents(imgs).astype(jnp.float32)
        ids = self.tokenizer([c for c in raw["caption"]])
        bi, pos = cond_mod.find_placeholder_indices(ids, self.subject_spec)
        b = z0.shape[0]
        if self.face_embedder is not None:
            faceid = np.stack([
                (self.face_embedder.embed_image(im)[:1].reshape(-1)
                 if len(self.face_embedder.embed_image(im)) else
                 self.rng.standard_normal(512).astype(np.float32))
                for im in raw["image_unnorm"]])
        else:
            faceid = self.rng.standard_normal((b, 512)).astype(np.float32)
        faceid = faceid / np.linalg.norm(faceid, axis=-1, keepdims=True)
        return {
            "z0": z0,
            "faceid": jnp.asarray(faceid),
            "caption_ids": jnp.asarray(ids),
            "subj_bi": jnp.asarray(bi if len(bi) == b else np.arange(b), jnp.int32),
            "subj_pos": jnp.asarray(pos if len(pos) == b else np.full(b, 1), jnp.int32),
            "fg_mask": self._latent_mask(raw["fg_mask"]),
            "aug_mask": self._latent_mask(raw["aug_mask"]),
            "skip_weights": self._skip_weights(),
        }

    # -- the state machine ---------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # -- compositional distillation iters -----------------------------------------

    def _ensure_compos(self):
        if hasattr(self, "_compos_phase"):
            return
        from adaprompt_tpu.train import compos_step as cs
        from adaprompt_tpu.adaface import subj_basis_generator as sbg

        self._cached_inits = cs.CachedInits(1000)
        models = cs.ComposModels(unet=self.frozen.unet, vae=self.vae_params,
                                 unet_cfg=self.frozen.unet_cfg,
                                 vae_cfg=self.vae_cfg)
        K = self.subj_basis_cfg.num_out_embs_per_layer
        frozen = self.frozen
        scfg = self.subj_basis_cfg
        tok = self.tokenizer

        def context_fn(trainable, batch):
            _, core_id = a2f.forward_face_embs(
                frozen.arc2face_text, tok, batch["faceid"],
                text_cfg=frozen.arc2face_text_cfg, input_max_length=21)
            core_id = jax.lax.stop_gradient(core_id)
            subj_embs, _ = sbg.forward(trainable["subj_basis"], scfg, tok,
                                       core_id, is_training=True)
            # encode the 4-type prompts; subject vectors spliced into rows 0,1
            ctx4 = cond_mod.encode_spliced(
                frozen.text, batch["ids4"],
                [(subj_embs[:, :1], batch["subj_rows"], batch["subj_pos4"], K)],
                batch["skip_weights"], 16, frozen.text_cfg, layerwise=True)
            # distribute the class embedding over the K aligned slots in the
            # cls rows (ddpm.py:2030-2050 / distribute_embedding_to_M_tokens)
            pos0 = batch["cls_pos"]                                # [2] traced
            L, _, S, D = ctx4.shape
            cls_rows = ctx4[:, 2:4]                                # [L,2,S,D]
            idx0 = jnp.broadcast_to(pos0.reshape(1, 2, 1, 1), (L, 2, 1, D))
            col0 = jnp.take_along_axis(cls_rows, idx0, axis=2)     # [L,2,1,D]
            repl = jnp.broadcast_to(col0 / np.sqrt(K), (L, 2, K, D))
            li = jnp.broadcast_to(jnp.arange(L)[:, None, None], (L, 2, K))
            bi = jnp.broadcast_to(jnp.asarray([2, 3])[None, :, None], (L, 2, K))
            pi = jnp.broadcast_to(pos0[None, :, None] + jnp.arange(K)[None, None], (L, 2, K))
            ctx4 = ctx4.at[li, bi, pi].set(repl.astype(ctx4.dtype))

            static_embs = ctx4.transpose(1, 0, 2, 3)          # [4, L, S, D]
            mask = (batch["ids4"] != tok.eos_id).astype(jnp.float32)[..., None]
            return {"ctx4": ctx4, "static_embs": static_embs,
                    "prompt_emb_mask": mask,
                    "subj_pos": batch["subj_pos_host"], "bg_pos": None}

        self._filter_ctx_fn = context_fn  # also usable eagerly for filtering
        self._compos_phase = cs.make_compos_train_phase(
            self.optimizer, models, context_fn, compute_dtype=self.dtype,
            training_percent=0.0)

    def prepare_compos_batch(self, raw: dict) -> dict | None:
        """4-type prompt batch from the first sample (BLOCK_SIZE=1,
        ddpm.py:2602-2606)."""
        use_fp = "subj_prompt_single_fp" in raw
        sfx = "_fp" if use_fp else ""
        prompts = [raw[f"subj_prompt_single{sfx}"][0],
                   raw[f"subj_prompt_comp{sfx}"][0].split("|")[0],
                   raw[f"cls_prompt_single{sfx}"][0],
                   raw[f"cls_prompt_comp{sfx}"][0].split("|")[0]]
        ids4 = self.tokenizer(prompts)
        bi, pos = cond_mod.find_placeholder_indices(ids4, self.subject_spec)
        if len(bi) < 2 or list(bi[:2]) != [0, 1]:
            return None
        # cls token in rows 2,3 is expected at the same positions
        subj_pos_host = [int(pos[0]) + k for k in
                         range(self.subject_spec.num_vectors)]
        b = len(raw["image"])
        imgs = jnp.asarray(raw["image"][:1], self.dtype)
        z0 = self._encode_latents(imgs).astype(jnp.float32)
        if self.face_embedder is not None:
            e = self.face_embedder.embed_image(raw["image_unnorm"][0])
            faceid = e[:1] if len(e) else self.rng.standard_normal((1, 512)).astype(np.float32)
        else:
            faceid = self.rng.standard_normal((1, 512)).astype(np.float32)
        faceid = faceid / np.linalg.norm(faceid, axis=-1, keepdims=True)
        return {
            "z0": z0,
            "ids4": jnp.asarray(ids4),
            "subj_rows": jnp.asarray(bi[:2], jnp.int32),
            "subj_pos4": jnp.asarray(pos[:2], jnp.int32),
            "cls_pos": jnp.asarray(pos[:2], jnp.int32),  # aligned templates
            "subj_pos_host": subj_pos_host,
            "faceid": jnp.asarray(faceid),
            "fg_mask": self._latent_mask(raw["fg_mask"][:1]),
            "skip_weights": self._skip_weights(),
            "subject_name": raw["subject_name"][0],
            "cls_comp_prompt": prompts[3],
        }

    def _teacher_filter(self, cbatch: dict, x_start, t, noise) -> bool:
        """Fresh-iteration CLIP teacher filtering (ddpm.py:3043-3135,
        3597-3664): denoise once, decode, CLIP-score the comp images against
        the class comp prompt; teachable iff cls loss <= 0.28 and
        subj - cls margin > 0.002."""
        if self.clip_scorer is None:
            return True
        from adaprompt_tpu.train import compos_step as cs
        from adaprompt_tpu.train.compos import clip_teachability
        if not hasattr(self, "_filter_phase"):
            models = cs.ComposModels(unet=self.frozen.unet, vae=self.vae_params,
                                     unet_cfg=self.frozen.unet_cfg,
                                     vae_cfg=self.vae_cfg)
            self._filter_phase = cs.make_filter_phase(models, cfg_scale=5.0,
                                                      compute_dtype=self.dtype)
        # one (subj_comp, mix_comp) candidate pair from the current contexts:
        # reuse the train-phase context_fn via a throwaway trace-free call
        cinfo = None
        try:
            cinfo = self._filter_ctx_fn(self.state.params, cbatch)
        except Exception:
            return True
        ctx4 = cinfo["ctx4"]
        ctx2 = ctx4[:, 1:4:2]  # (subj_comp, cls_comp)
        x2 = x_start[1:4:2]
        t2 = t[1:4:2]
        n2 = noise[1:4:2]
        _, imgs = self._filter_phase(ctx2, ctx2, None, x2, t2, n2)
        prompt = cbatch["cls_comp_prompt"]
        sims = self.clip_scorer.txt_to_img_similarity(
            [prompt, prompt], np.asarray(imgs), reduction="diag")
        losses = 0.5 - np.asarray(sims)
        ok = clip_teachability(jnp.asarray([losses[1]]), jnp.asarray([losses[0]]))
        return bool(np.asarray(ok)[0])

    def _compos_step(self, cbatch: dict) -> dict:
        from adaprompt_tpu.train import compos_step as cs
        self._ensure_compos()
        name = cbatch["subject_name"]
        fresh = not self._cached_inits.has(name)
        if not fresh:
            x_start_np, t_np = self._cached_inits.take(name, self.rng)
            x_start = jnp.asarray(x_start_np)
            t = jnp.asarray(t_np)
        else:
            t = jnp.asarray(self.rng.integers(800, 1000, size=(4,)), jnp.int32)
            z0 = jnp.tile(cbatch["z0"], (4, 1, 1, 1))
            fg = jnp.tile(cbatch["fg_mask"], (4, 1, 1, 1))
            scale = cs.pick_fg_rand_scale(np.asarray(cbatch["fg_mask"]), self.rng)
            x_start, _, _ = cs.init_x_with_fg_from_training_image(
                z0, fg, fg, self._next_key(), scale)
        noise = jax.random.normal(self._next_key(), x_start.shape, jnp.float32)

        if fresh and not self._teacher_filter(cbatch, x_start, t, noise):
            return {"iter_type": "compos_distill_skipped", "teachable": 0.0}
        batch = {"x_start": x_start, "t": t, "noise": noise,
                 "fg_mask": cbatch["fg_mask"],
                 "faceid": cbatch["faceid"], "ids4": cbatch["ids4"],
                 "subj_rows": cbatch["subj_rows"], "subj_pos4": cbatch["subj_pos4"],
                 "cls_pos": cbatch["cls_pos"],
                 "subj_pos_host": tuple(cbatch["subj_pos_host"]),
                 "skip_weights": cbatch["skip_weights"],
                 # 50% coin: affine-free LN on mix-loss outfeats
                 # (ddpm.py:3371-3384)
                 "normalize_outfeat": jnp.asarray(
                     float(self.rng.random() < 0.5), jnp.float32)}
        self.state, metrics, x_recon = self._compos_phase(self.state, batch,
                                                          self._next_key())
        self._cached_inits.put(name, np.asarray(x_recon), np.asarray(t))
        metrics = dict(metrics)
        self._update_q_bn_stats(metrics.pop("q_bn_stats", {}))
        metrics["iter_type"] = "compos_distill"
        return metrics

    def _update_q_bn_stats(self, batch_stats: dict, momentum: float = 0.1):
        """ca_q_bns bookkeeping (embedding_manager.py:1205-1215): affine-free
        BatchNorms whose running stats are saved in checkpoints. The
        normalization itself happens with batch stats inside the jitted
        compos loss; here we fold the returned batch stats into running
        mean/var with torch's default momentum."""
        for li, (m, v) in batch_stats.items():
            m, v = np.asarray(m), np.asarray(v)
            ent = self.ca_q_bn_stats.get(li)
            if ent is None:
                self.ca_q_bn_stats[li] = {"mean": m, "var": v}
            else:
                ent["mean"] = (1 - momentum) * ent["mean"] + momentum * m
                ent["var"] = (1 - momentum) * ent["var"] + momentum * v

    def train_step(self, step_idx: int) -> dict:
        raw = next(self.batch_iterator)

        if (self.cfg.composition_regs_iter_gap > 0
                and step_idx % self.cfg.composition_regs_iter_gap == 0
                and step_idx > 0):
            cbatch = self.prepare_compos_batch(raw)
            if cbatch is not None:
                metrics = self._compos_step(cbatch)
                out = {k: (float(v) if hasattr(v, "dtype") else v)
                       for k, v in metrics.items()}
                out["step"] = step_idx
                self._metrics_file.write(json.dumps(out) + "\n")
                self._metrics_file.flush()
                return out

        batch = self._shard_batch(self.prepare_recon_batch(raw))

        do_distill = self.rng.random() < self.cfg.arc2face_distill_iter_prob
        if do_distill:
            nd = int(self.rng.choice(self.cfg.num_denoising_steps_range))
            if nd not in self._distill_steps:
                self._distill_steps[nd] = jax.jit(steps_mod.make_arc2face_distill_step(
                    self.optimizer, self.frozen, self.tokenizer,
                    self.subj_basis_cfg, num_denoising_steps=nd,
                    compute_dtype=self.dtype,
                    skip_weights=self.cfg.skip_weights))
            self.state, metrics = self._distill_steps[nd](self.state, batch,
                                                          self._next_key())
            metrics["iter_type"] = "arc2face_distill"
        else:
            self.state, metrics = self._recon_step(self.state, batch, self._next_key())
            metrics["iter_type"] = "recon"

        out = {k: (float(v) if hasattr(v, "dtype") else v)
               for k, v in metrics.items()}
        out["step"] = step_idx
        self._metrics_file.write(json.dumps(out) + "\n")
        self._metrics_file.flush()
        return out

    def train(self, num_steps: int | None = None):
        n = num_steps or self.cfg.max_steps
        t0 = time.time()
        for i in range(n):
            metrics = self.train_step(i)
            if (i + 1) % self.cfg.ckpt_every == 0 or i == n - 1:
                self.save_checkpoint(i + 1)
        return time.time() - t0

    def log_samples(self, step: int, prompt: str = "a photo of a z",
                    faceid: np.ndarray | None = None, num_steps: int = 20,
                    n: int = 2, height: int = 512, width: int = 512):
        """Periodic sample grid (ImageLogger role, main.py:563-666): generate
        with the CURRENT SubjBasisGenerator and save a PNG strip."""
        from adaprompt_tpu import pipeline as pl
        from adaprompt_tpu.adaface import subj_basis_generator as sbg
        from adaprompt_tpu.adaface import conditioner as cond_mod2
        from adaprompt_tpu.adaface import arc2face as a2f_mod

        if faceid is None:
            faceid = self.rng.standard_normal((1, 512)).astype(np.float32)
            faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)
        params = pl.SDParams(unet=self.frozen.unet, vae=self.vae_params,
                             text=self.frozen.text)
        pipe = pl.StableDiffusionPipeline(
            params, tokenizer=self.tokenizer, unet_cfg=self.frozen.unet_cfg,
            vae_cfg=self.vae_cfg, text_cfg=self.frozen.text_cfg,
            compute_dtype=self.dtype)
        _, core_id = a2f_mod.forward_face_embs(
            self.frozen.arc2face_text, self.tokenizer, jnp.asarray(faceid),
            text_cfg=self.frozen.arc2face_text_cfg, input_max_length=21)
        subj_embs, _ = sbg.forward(self.state.params["subj_basis"],
                                   self.subj_basis_cfg, self.tokenizer,
                                   core_id, is_training=False)
        pc = cond_mod2.PromptConditioner(self.frozen.text, self.tokenizer,
                                         [self.subject_spec], self.frozen.text_cfg)
        cond = pc([prompt] * n, {self.subject_spec.string: subj_embs})
        uncond = pc([pl.DEFAULT_NEGATIVE_PROMPT] * n, {})
        imgs = pipe.generate(None, context=cond, context_uncond=uncond,
                             num_steps=num_steps, height=height, width=width,
                             seed=step)
        from PIL import Image
        strip = np.concatenate(list(imgs), axis=1)
        path = os.path.join(self.cfg.out_dir, f"samples_gs-{step}.png")
        Image.fromarray(strip).save(path)
        return path

    def save_checkpoint(self, step: int):
        path = os.path.join(self.cfg.out_dir, f"embeddings_gs-{step}.npz")
        trees = {"subj_basis": self.state.params["subj_basis"]}
        if self.ca_q_bn_stats:
            # saved alongside, like the reference's ckpt["ca_q_bns"]
            # (embedding_manager.py:1824-1838)
            trees["ca_q_bns"] = {str(li): dict(v)
                                 for li, v in self.ca_q_bn_stats.items()}
        ckpt_mod.save_checkpoint(path, trees,
                                 meta={"step": step,
                                       "placeholder": self.subject_spec.string})
        return path

    def load_checkpoint(self, path: str):
        trees, meta = ckpt_mod.load_checkpoint(path)
        params = dict(self.state.params)
        params["subj_basis"] = trees["subj_basis"]
        if "ca_q_bns" in trees:
            self.ca_q_bn_stats = {int(li): {k: np.asarray(a)
                                            for k, a in v.items()}
                                  for li, v in trees["ca_q_bns"].items()}
        self.state = steps_mod.create_train_state(params, self.optimizer)
        return meta

    # -- full-state resume (the reference's Lightning -r/--resume role) --------

    def save_full_state(self, step: int) -> str:
        """Snapshot params + optimizer state + step for exact resume
        (incl. Prodigy's D estimate and EMAs)."""
        import numpy as np
        flat = {}
        for name, tree in self.state.params.items():
            flat.update(ckpt_mod._flatten(tree, f"params.{name}/"))
        ckpt_mod.save_pytree_leaves("optstate", self.state.opt_state, flat)
        flat["__meta__"] = np.frombuffer(
            json.dumps({"step": step}).encode(), dtype=np.uint8)
        path = os.path.join(self.cfg.out_dir, f"trainer_state-{step}.npz")
        np.savez(path, **flat)
        return path

    def load_full_state(self, path: str):
        import numpy as np
        data = np.load(path, allow_pickle=False)
        meta = json.loads(bytes(data["__meta__"]).decode())
        flat = {k: data[k] for k in data.files if k != "__meta__"}
        param_flat = {k[len("params."):]: v for k, v in flat.items()
                      if k.startswith("params.")}
        groups: dict = {}
        for k, v in param_flat.items():
            name, rest = k.split("/", 1)
            groups.setdefault(name, {})[rest] = v
        params = {name: ckpt_mod._unflatten(g) for name, g in groups.items()}
        opt_template = self.optimizer.init(params)
        opt_state = ckpt_mod.load_pytree_leaves("optstate", opt_template, flat)
        self.state = steps_mod.TrainState(params=params, opt_state=opt_state,
                                          step=jnp.asarray(meta["step"], jnp.int32))
        return meta
