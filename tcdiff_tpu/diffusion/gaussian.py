"""Gaussian diffusion over multi-dancer motion — losses and samplers.

TPU-first rebuild of the reference `GaussianDiffusion`
(`/root/reference/model/diffusion.py:79-763`):

  * All samplers are ONE `lax.scan` over precomputed (time, time_next,
    weight) step tables — the reference runs host-side Python loops with a
    tqdm bar per step (`model/diffusion.py:275,314,407,474`). One compile,
    zero host round-trips.
  * Classifier-free guidance is a single doubled-batch forward per step
    (the reference calls the network twice, `model/model.py:542-546`).
  * In-loop mutations (trajectory overwrite, slice half-copy, footwork
    channel splicing) are functional `.at[].set` updates that XLA turns into
    fused dynamic-update-slices.
  * RNG is explicit; every sampler accepts pre-drawn noise arrays so parity
    runs can inject reference-recorded torch noise (the reference uses
    global unseeded `torch.randn`, `model/diffusion.py:269,297,393`).

Channel layout: [contacts(4), root xyz(3), rot6d(144)]; channels 4,5 are the
global XY trajectory that stays clamped to the DBN output during sampling
(`model/diffusion.py:427-431`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcdiff_tpu.config import DiffusionConfig, FOOT_JOINTS
from tcdiff_tpu.diffusion.schedules import DiffusionBuffers, ddim_times
from tcdiff_tpu.geometry import smpl_fk_from_6d, smpl_fk_rel_from_6d
from tcdiff_tpu.geometry.skeleton import _use_ancmat
from tcdiff_tpu.models.dance_decoder import DanceDecoder

# foot-joint indices into the root-RELATIVE joint axis (joints 1..23)
_FOOT_REL = tuple(j - 1 for j in FOOT_JOINTS)


def _impose_traj(x: jnp.ndarray, x_0: jnp.ndarray) -> jnp.ndarray:
    """Clamp channels 4,5 (global XY) to the given trajectory.

    x: (b, tokens, 151); x_0: (b, tokens, >=2) with XY in channels 0,1
    (`model/diffusion.py:396-403,427-431` — the reference reshapes to
    (b, seq, dn, c) first, but channelwise assignment is reshape-invariant).
    """
    x = x.at[..., 4].set(x_0[..., 0])
    return x.at[..., 5].set(x_0[..., 1])


def _footwork_channels(joints) -> list:
    """rot6d channel slices for the leg-chain joints
    (`model/diffusion.py:308-309`: 4+3+(i-1)*6 : 4+3+i*6 for joint i)."""
    return [(4 + 3 + (i - 1) * 6, 4 + 3 + i * 6) for i in joints]


class GaussianDiffusion:
    """Functional diffusion core bound to a DanceDecoder module.

    All methods take `params` explicitly and are jit-compatible; the object
    itself holds only static configuration and numpy coefficient tables.
    """

    def __init__(self, model: DanceDecoder, cfg: DiffusionConfig):
        self.model = model
        self.cfg = cfg
        self.seq_len = model.cfg.seq_len
        self.nfeats = model.cfg.nfeats
        self.buffers = DiffusionBuffers.create(cfg.schedule, cfg.n_timestep, cfg.use_p2)

    # ------------------------------------------------------------------ CFG
    def encode_cond_cfg(self, params, cond):
        """Encode the music condition ONCE for a doubled (uncond ‖ cond)
        batch. The encoding is independent of x and t, so samplers hoist it
        out of the denoising scan (the reference re-encodes in every one of
        the 100 forwards per clip, `model/model.py:571-581`)."""
        b = cond.shape[0]
        keep = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)])
        cc = jnp.concatenate([cond, cond], axis=0)
        return self.model.apply(
            {"params": params}, None, cc, None, keep,
            deterministic=True, return_cond_cache=True,
        )

    def guided(self, params, x, cond, t_vec, weight, trj_dist=None, cond_cache=None):
        """One doubled-batch CFG forward: unc + (cond - unc) * weight.

        With TCDIFF_CFG_DEDUP (default), x is passed at half batch and the
        model computes the x-only prefix once (cfg_pair=True — see
        models/dance_decoder.py::_use_cfg_dedup); exact same outputs."""
        from tcdiff_tpu.models.dance_decoder import _use_cfg_dedup

        b = x.shape[0]
        keep = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)])
        cc = None if cond_cache is not None else jnp.concatenate([cond, cond], axis=0)
        tt = jnp.concatenate([t_vec, t_vec], axis=0)
        if _use_cfg_dedup() and not self.model.remat:
            out = self.model.apply(
                {"params": params}, x, cc, tt, keep, trj_dist,
                deterministic=True, cond_cache=cond_cache, cfg_pair=True,
            )
        else:
            xx = jnp.concatenate([x, x], axis=0)
            td = None if trj_dist is None else jnp.concatenate([trj_dist, trj_dist], axis=0)
            out = self.model.apply(
                {"params": params}, xx, cc, tt, keep, td,
                deterministic=True, cond_cache=cond_cache,
            )
        unc, con = out[:b], out[b:]
        return unc + (con - unc) * weight

    # ------------------------------------------------------------- training
    def q_sample(self, x_start, t, noise):
        """Forward process q(x_t | x_0) (`model/diffusion.py:625-634`).
        t broadcasts over all trailing dims of x_start."""
        buf = self.buffers
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        a = jnp.asarray(buf.sqrt_alphas_cumprod)[t].reshape(shape)
        b = jnp.asarray(buf.sqrt_one_minus_alphas_cumprod)[t].reshape(shape)
        return a * x_start + b * noise

    def p_losses(self, params, x_start, cond, t, rng, trj_dist=None, noise=None, keep_mask=None):
        """The 4-term training loss (`model/diffusion.py:636-741`).

        x_start: (bs, dn, sq, c) as yielded by the dataset.
        noise/keep_mask may be injected for parity runs against recorded
        reference randomness; noise is in the PERMUTED (bs, sq, dn, c) layout.
        Returns (total, dict of the four weighted components).
        """
        cfg = self.cfg
        bs, dn, sq, c = x_start.shape
        k_noise, k_keep, k_drop = jax.random.split(rng, 3)

        x_start = x_start.transpose(0, 2, 1, 3)  # (bs, sq, dn, c)
        if noise is None:
            noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x_noisy = self.q_sample(x_start, t, noise)
        # the trajectory channels are never noised (`model/diffusion.py:650`)
        x_noisy = x_noisy.at[..., 4].set(x_start[..., 4])
        x_noisy = x_noisy.at[..., 5].set(x_start[..., 5])
        x_noisy = x_noisy.reshape(bs, sq * dn, c)

        if keep_mask is None:
            keep_mask = jax.random.bernoulli(k_keep, 1.0 - cfg.cond_drop_prob, (bs,))
        model_out = self.model.apply(
            {"params": params},
            x_noisy,
            cond,
            t,
            keep_mask,
            trj_dist,
            deterministic=False,
            rngs={"dropout": k_drop},
        )

        target = x_start  # predict-x0 (`model/diffusion.py:657-660`)
        model_out = model_out.reshape(bs, sq, dn, c)

        p2 = jnp.asarray(self.buffers.p2_loss_weight)[t]  # (bs,)

        def per_sample_mse(a, b):
            return jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)))

        recon = per_sample_mse(model_out, target) * p2

        model_contact = model_out[..., :4]
        model_rest = model_out[..., 4:]
        target_rest = target[..., 4:]

        v_loss = per_sample_mse(
            model_rest[:, 1:] - model_rest[:, :-1], target_rest[:, 1:] - target_rest[:, :-1]
        ) * p2

        # relative FK loss on NORMALIZED values — the reference's unnormalize
        # is commented out (`model/diffusion.py:687-689`)
        model_x = model_rest[..., :3].reshape(bs, sq * dn, 3)
        target_x = target_rest[..., :3].reshape(bs, sq * dn, 3)
        model_q6 = model_rest[..., 3:].reshape(bs, sq * dn, 24, 6)
        target_q6 = target_rest[..., 3:].reshape(bs, sq * dn, 24, 6)
        if _use_ancmat():
            # root-relative FK both sides: the reference's root subtraction
            # (`model/diffusion.py:700-708`) cancels the root add, so the
            # absolute assembly (and the target's root entirely) is skipped;
            # only the 4 foot joints get the root added back for foot-skate
            model_rel = smpl_fk_rel_from_6d(model_q6)  # (bs, sq*dn, 23, 3)
            target_rel = smpl_fk_rel_from_6d(target_q6)
            fk_loss = per_sample_mse(model_rel, target_rel) * p2
            feet = model_x.reshape(bs, sq, dn, 1, 3) + model_rel.reshape(
                bs, sq, dn, 23, 3
            )[:, :, :, _FOOT_REL, :]
        else:
            model_xp = smpl_fk_from_6d(model_q6, model_x)  # (bs, sq*dn, 24, 3)
            target_xp = smpl_fk_from_6d(target_q6, target_x)
            fk_loss = per_sample_mse(
                model_xp[:, :, 1:] - model_xp[:, :, :1],
                target_xp[:, :, 1:] - target_xp[:, :, :1],
            ) * p2
            feet = model_xp.reshape(bs, sq, dn, 24, 3)[:, :, :, FOOT_JOINTS, :]

        # foot-skate loss (`model/diffusion.py:719-733`)
        static = model_contact > 0.95  # (bs, sq, dn, 4)
        foot_v = jnp.concatenate([feet[:, 1:] - feet[:, :-1], jnp.zeros_like(feet[:, :1])], axis=1)
        foot_v = jnp.where(static[..., None], foot_v, 0.0)
        foot_loss = jnp.mean(foot_v**2, axis=tuple(range(1, foot_v.ndim)))

        losses = {
            "recon": cfg.w_recon * recon.mean(),
            "velocity": cfg.w_velocity * v_loss.mean(),
            "fk": cfg.w_fk * fk_loss.mean(),
            "foot": cfg.w_foot * foot_loss.mean(),
        }
        return sum(losses.values()), losses

    def loss(self, params, x, cond, rng, t_override=None, trj_dist=None):
        """Sample t ~ U[0, T) then p_losses (`model/diffusion.py:744-753`)."""
        bs = x.shape[0]
        k_t, k_rest = jax.random.split(rng)
        if t_override is None:
            t = jax.random.randint(k_t, (bs,), 0, self.cfg.n_timestep)
        else:
            t = jnp.full((bs,), t_override, dtype=jnp.int32)
        return self.p_losses(params, x, cond, t, k_rest, trj_dist)

    # ------------------------------------------------------------- sampling
    def _ddim_step_tables(self) -> Tuple[np.ndarray, np.ndarray]:
        times = ddim_times(self.cfg.n_timestep, self.cfg.sampling_timesteps)
        return times[:-1].copy(), times[1:].copy()  # (S,), (S,)

    def _ddim_scan(
        self,
        params,
        cond,
        x,
        rng,
        weights: np.ndarray,
        x_0=None,
        step_noise=None,
        footwork: bool = False,
        long_mode: bool = False,
        trj_dist=None,
        stream_prev=None,
        forecast_every: int = 0,
    ):
        """Shared DDIM machinery for ddim / long / footwork variants.

        forecast_every >= 2 enables multistep feature forecasting (an
        opt-in accelerator in the spirit of BlockDance / linear-multistep
        feature forecasting for diffusion transformers, PAPERS.md): on
        skipped steps the denoiser's x0 prediction is extrapolated
        linearly from the previous two predictions instead of running the
        network — `lax.cond` executes only one branch, so a cadence of 2
        nearly halves the model forwards. The DDIM update, trajectory
        imposition, and coupling run on every step unchanged; the first
        two and the final step always use the real model. 0/1 = exact."""
        cfg = self.cfg
        buf = self.buffers
        b = x.shape[0]
        times, times_next = self._ddim_step_tables()
        n_steps = len(times)
        seq_len = self.seq_len
        half = seq_len // 2
        fw_lo, fw_hi = cfg.footwork_frames
        fw_ch = _footwork_channels(cfg.footwork_joints)

        ac = jnp.asarray(buf.alphas_cumprod)
        sr = jnp.asarray(buf.sqrt_recip_alphas_cumprod)
        srm1 = jnp.asarray(buf.sqrt_recipm1_alphas_cumprod)

        def splice_footwork(xs, hard: bool):
            """Overwrite frames [75,120) of the leg-chain rot6d channels from
            x_0 (`model/diffusion.py:307-309,343-344,371-379`)."""
            c = xs.shape[-1]
            x4 = xs.reshape(b, seq_len, -1, c)
            ref4 = x_0.reshape(b, seq_len, -1, x_0.shape[-1])
            if hard:
                for lo, hi in fw_ch:
                    x4 = x4.at[:, fw_lo:fw_hi, :, lo:hi].set(ref4[:, fw_lo:fw_hi, :, lo:hi])
            else:
                # Faithful to the reference's final blend
                # (`model/diffusion.py:367-379`) including its quirks: the
                # "middle" hard-replace spans fw_lo+w .. seq_len-w (NOT
                # fw_hi-w), and the blend-out then reads the just-replaced
                # values, so frames [fw_hi-w, seq_len-w) end up equal to x_0.
                w = cfg.footwork_blend_width
                ramp = jnp.linspace(0.0, 1.0, w)[None, :, None, None]
                for lo, hi in fw_ch:
                    blend_in = (
                        ramp * ref4[:, fw_lo : fw_lo + w, :, lo:hi]
                        + (1 - ramp) * x4[:, fw_lo : fw_lo + w, :, lo:hi]
                    )
                    x4 = x4.at[:, fw_lo : fw_lo + w, :, lo:hi].set(blend_in)
                    x4 = x4.at[:, fw_lo + w : seq_len - w, :, lo:hi].set(
                        ref4[:, fw_lo + w : seq_len - w, :, lo:hi]
                    )
                    blend_out = (1 - ramp) * ref4[:, fw_hi - w : fw_hi, :, lo:hi] + ramp * x4[
                        :, fw_hi - w : fw_hi, :, lo:hi
                    ]
                    x4 = x4.at[:, fw_hi - w : fw_hi, :, lo:hi].set(blend_out)
            return x4.reshape(xs.shape)

        def half_copy(xs):
            """Slice-coupling: first half of slice i+1 := second half of
            slice i (`model/diffusion.py:502-506`). Slices live on the batch
            axis; frames on the (seq, dn, c) view."""
            c = xs.shape[-1]
            x4 = xs.reshape(b, seq_len, -1, c)
            shifted = jnp.concatenate([x4[:1, :half], x4[:-1, half:]], axis=0)
            x4 = x4.at[:, :half].set(shifted)
            return x4.reshape(xs.shape)

        if x_0 is not None:
            x = _impose_traj(x, x_0)
            if footwork:
                x = splice_footwork(x, hard=True)

        w_arr = jnp.asarray(weights, dtype=jnp.float32)
        t_arr = jnp.asarray(times)
        tn_arr = jnp.asarray(times_next)
        cond_cache = self.encode_cond_cfg(params, cond)  # hoisted: t-independent

        fc = bool(forecast_every and forecast_every >= 2)
        use_model = np.ones(n_steps, dtype=bool)
        if fc:
            use_model[:] = False
            use_model[::forecast_every] = True
            use_model[:2] = True  # LMS needs two real predictions to start
            use_model[-1] = True  # the returned x IS x_start on the last step
        um_arr = jnp.asarray(use_model)

        def body(carry, inp):
            if fc:
                xc, key, s1, s2 = carry
            else:
                xc, key = carry
                s1 = s2 = None
            i = inp
            time = t_arr[i]
            time_next = tn_arr[i]
            weight = w_arr[i]

            t_vec = jnp.full((b,), time, dtype=jnp.int32)

            def _model_xs(ops):
                xs = self.guided(
                    params, ops[0], cond, t_vec, weight, trj_dist, cond_cache=cond_cache
                )
                return jnp.clip(xs, -1.0, 1.0) if cfg.clip_denoised else xs

            if fc:
                def _forecast_xs(ops):
                    xs = 2.0 * ops[1] - ops[2]  # AB2 extrapolation of x0-pred
                    return jnp.clip(xs, -1.0, 1.0) if cfg.clip_denoised else xs

                x_start = jax.lax.cond(um_arr[i], _model_xs, _forecast_xs, (xc, s1, s2))
            else:
                x_start = _model_xs((xc,))
            pred_noise = (sr[time] * xc - x_start) / srm1[time]

            alpha = ac[time]
            alpha_next = ac[jnp.maximum(time_next, 0)]
            sigma = cfg.ddim_eta * jnp.sqrt(
                jnp.maximum((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
            )
            coef = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))

            if step_noise is None:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, xc.shape, xc.dtype)
            else:
                noise = step_noise[i]

            x_new = x_start * jnp.sqrt(alpha_next) + coef * pred_noise + sigma * noise
            x_new = jnp.where(time_next < 0, x_start, x_new)

            if x_0 is not None:
                x_new = _impose_traj(x_new, x_0)
                if footwork:
                    # the reference skips the hard splice on the final step
                    # (`:349` handles it with the soft blend after the loop)
                    spliced = splice_footwork(x_new, hard=True)
                    x_new = jnp.where(time_next < 0, x_new, spliced)
            if long_mode:
                # the reference's final step `continue`s before the coupling
                # block (`model/diffusion.py:478-480,502-506`), so gate on
                # time_next >= 0 as well as time > 0
                coupled = half_copy(x_new)
                x_new = jnp.where((time > 0) & (time_next >= 0), coupled, x_new)
            if stream_prev is not None:
                # causal streaming: the first half-window is INPAINTED from
                # the previous (fully denoised) slice's tail, re-noised to
                # the current level (RePaint-style q_sample conditioning)
                c = x_new.shape[-1]
                x4 = x_new.reshape(b, seq_len, -1, c)
                prev4 = stream_prev.reshape(b, half, -1, c)
                key, sub = jax.random.split(key)
                pn = jax.random.normal(sub, prev4.shape, prev4.dtype)
                tn = jnp.maximum(time_next, 0)
                a_t = jnp.sqrt(ac[tn])
                s_t = jnp.sqrt(1.0 - ac[tn])
                prev_noised = a_t * prev4 + s_t * pn
                prev_t = jnp.where(time_next > 0, prev_noised, prev4)
                x4 = x4.at[:, :half].set(prev_t)
                x_new = x4.reshape(x_new.shape)

            new_carry = (x_new, key, x_start, s1) if fc else (x_new, key)
            return new_carry, None

        init = (x, rng, jnp.zeros_like(x), jnp.zeros_like(x)) if fc else (x, rng)
        out_carry, _ = jax.lax.scan(
            body, init, jnp.arange(n_steps), unroll=self.cfg.scan_unroll
        )
        x = out_carry[0]

        if x_0 is not None:
            x = _impose_traj(x, x_0)
            if footwork:
                x = splice_footwork(x, hard=False)
        return x

    def ddim_sample(
        self, params, shape, cond, rng, x_0=None, noise=None, trj_dist=None,
        forecast_every: int = 0,
    ):
        """50-step DDIM, eta=1 (`model/diffusion.py:386-442`).

        shape: (b, seq_len*dn, 151); x_0: optional (b, seq_len*dn, >=2)
        trajectory (XY in channels 0,1); noise: optional dict with "init"
        (shape) and "steps" ((S,)+shape) arrays for parity runs.
        forecast_every: opt-in LMS feature-forecast acceleration (see
        _ddim_scan); 0 = exact reference semantics.
        """
        k_init, k_scan = jax.random.split(rng)
        x = jax.random.normal(k_init, shape) if noise is None else jnp.asarray(noise["init"])
        step_noise = None if noise is None else jnp.asarray(noise["steps"])
        weights = np.full(self.cfg.sampling_timesteps, self.cfg.guidance_weight, np.float32)
        return self._ddim_scan(
            params, cond, x, k_scan, weights, x_0, step_noise, trj_dist=trj_dist,
            forecast_every=forecast_every,
        )

    def long_ddim_sample(self, params, shape, cond, rng, x_0=None, noise=None):
        """Sliced long-form DDIM with in-loop half-window coupling and a
        guidance ramp (`model/diffusion.py:445-515`). Batch = slices."""
        if shape[0] == 1:
            return self.ddim_sample(params, shape, cond, rng, x_0=None, noise=noise)
        k_init, k_scan = jax.random.split(rng)
        x = jax.random.normal(k_init, shape) if noise is None else jnp.asarray(noise["init"])
        step_noise = None if noise is None else jnp.asarray(noise["steps"])
        s = self.cfg.sampling_timesteps
        weights = np.clip(
            np.linspace(0, self.cfg.guidance_weight * 2, s), None, self.cfg.guidance_weight
        ).astype(np.float32)
        return self._ddim_scan(
            params, cond, x, k_scan, weights, x_0, step_noise, long_mode=True
        )

    def ddim_sample_stream(
        self, params, shape, cond, rng, x_0=None, prev_tail=None, noise=None
    ):
        """Causal single-slice DDIM for streaming generation: the slice's
        first half-window is inpainted from `prev_tail` — the previous
        slice's (already generated) second half, re-noised to each step's
        level — so consecutive slices agree without denoising them jointly.

        A latency-oriented capability beyond the reference: `long_ddim`
        needs the WHOLE song's slices in one batch, this needs one slice.
        prev_tail: (b, (seq_len//2)*dn, nfeats) or None for the first slice.
        """
        k_init, k_scan = jax.random.split(rng)
        x = jax.random.normal(k_init, shape) if noise is None else jnp.asarray(noise["init"])
        step_noise = None if noise is None else jnp.asarray(noise["steps"])
        weights = np.full(self.cfg.sampling_timesteps, self.cfg.guidance_weight, np.float32)
        return self._ddim_scan(
            params, cond, x, k_scan, weights, x_0, step_noise,
            stream_prev=None if prev_tail is None else jnp.asarray(prev_tail),
        )

    def long_ddim_sample_sharded(
        self, params, shape, cond, rng, mesh, x_0=None, noise=None
    ):
        """Long-form DDIM with the SLICE batch sharded over the mesh's dp
        axis — the sequence-parallel scaling path (SURVEY §2.4/§5): each
        chip denoises its slices, and the in-loop half-window coupling
        between neighboring slices (`model/diffusion.py:502-506`) becomes a
        collective-permute over ICI, inserted by XLA's SPMD partitioner from
        the very same batch-shift the single-chip path uses.

        Bit-identical to `long_ddim_sample` when `noise` is provided
        (otherwise the PRNG stream is identical too — keys are replicated).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        sliced = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())

        cond = jax.device_put(jnp.asarray(cond), sliced)
        put_rep = lambda t: jax.tree.map(lambda a: jax.device_put(a, rep), t)
        params = put_rep(params)
        rng = jax.device_put(rng, rep)
        if x_0 is not None:
            x_0 = jax.device_put(jnp.asarray(x_0), sliced)
        if noise is not None:
            noise = {
                "init": jax.device_put(jnp.asarray(noise["init"]), sliced),
                # steps: (S, n_slices, ...) — slice axis is dim 1
                "steps": jax.device_put(
                    jnp.asarray(noise["steps"]), NamedSharding(mesh, P(None, "dp"))
                ),
            }
        fn = jax.jit(
            self.long_ddim_sample, static_argnums=(1,), out_shardings=sliced
        )
        return fn(params, shape, cond, rng, x_0, noise)

    def ddim_sample_footwork(self, params, shape, cond, rng, x_0, noise=None):
        """Footwork-adaptor DDIM: leg-chain rot6d channels of frames 75-120
        are driven by a reference motion with blend-in/out
        (`model/diffusion.py:288-383`). x_0: (b, seq*dn, 151) reference
        motion whose channels 0,1 hold the XY trajectory."""
        k_init, k_scan = jax.random.split(rng)
        x = jax.random.normal(k_init, shape) if noise is None else jnp.asarray(noise["init"])
        step_noise = None if noise is None else jnp.asarray(noise["steps"])
        weights = np.full(self.cfg.sampling_timesteps, self.cfg.guidance_weight, np.float32)
        return self._ddim_scan(
            params, cond, x, k_scan, weights, x_0, step_noise, footwork=True
        )

    # ---------------------------------------------------------- DDPM loops
    def _ddpm_weights(self, n: int) -> np.ndarray:
        """Per-timestep guidance with the near-zero clip
        (`model/diffusion.py:217-224`)."""
        w = np.full(n, self.cfg.guidance_weight, np.float32)
        w[np.arange(n) < 0.1 * self.cfg.n_timestep] = min(self.cfg.guidance_weight, 1.0)
        return w

    def p_sample_loop(
        self,
        params,
        shape,
        cond,
        rng,
        noise=None,
        start_point=None,
        mode: str = "normal",
        constraint=None,
        x_init=None,
    ):
        """Ancestral DDPM loop; mode in {normal, inpaint, long}
        (`model/diffusion.py:254-286,518-609`)."""
        cfg = self.cfg
        buf = self.buffers
        b = shape[0]
        start = cfg.n_timestep if start_point is None else int(start_point)
        seq_len = self.seq_len
        half = shape[1] // 2 if mode == "long" else seq_len // 2

        k_init, k_scan = jax.random.split(rng)
        if x_init is not None:
            x = jnp.asarray(x_init)
        elif noise is None:
            x = jax.random.normal(k_init, shape)
        else:
            x = jnp.asarray(noise["init"])
        step_noise = None if noise is None or "steps" not in noise else jnp.asarray(noise["steps"])

        w_tab = jnp.asarray(self._ddpm_weights(cfg.n_timestep))
        pm1 = jnp.asarray(buf.posterior_mean_coef1)
        pm2 = jnp.asarray(buf.posterior_mean_coef2)
        plv = jnp.asarray(buf.posterior_log_variance_clipped)

        if mode == "inpaint":
            mask = jnp.asarray(constraint["mask"])
            value = jnp.asarray(constraint["value"])

        cond_cache = self.encode_cond_cfg(params, cond)  # hoisted: t-independent

        def body(carry, i):
            xc, key = carry
            t = start - 1 - i  # descending
            t_vec = jnp.full((b,), t, dtype=jnp.int32)
            x_recon = self.guided(params, xc, cond, t_vec, w_tab[t], cond_cache=cond_cache)
            if cfg.clip_denoised:
                x_recon = jnp.clip(x_recon, -1.0, 1.0)
            mean = pm1[t] * x_recon + pm2[t] * xc
            if step_noise is None:
                key, sub = jax.random.split(key)
                z = jax.random.normal(sub, xc.shape, xc.dtype)
            else:
                z = step_noise[i]
            nonzero = (t != 0).astype(xc.dtype)
            x_new = mean + nonzero * jnp.exp(0.5 * plv[t]) * z

            if mode == "inpaint":
                # q_sample(value, t-1) while t > 0; at t == 0 the constraint
                # is a no-op (`model/diffusion.py:546-549` sets value_ = x)
                key, sub = jax.random.split(key)
                vnoise = jax.random.normal(sub, value.shape, value.dtype)
                value_t = self.q_sample(value, jnp.maximum(t_vec - 1, 0), vnoise)
                constrained = value_t * mask + (1.0 - mask) * x_new
                x_new = jnp.where(t > 0, constrained, x_new)
            elif mode == "long":
                c = x_new.shape[-1]
                x4 = x_new
                shifted = jnp.concatenate([x4[:1, :half], x4[:-1, half:]], axis=0)
                coupled = x4.at[:, :half].set(shifted)
                x_new = jnp.where(t > 0, coupled, x_new)

            return (x_new, key), None

        (x, _), _ = jax.lax.scan(body, (x, k_scan), jnp.arange(start))
        return x

    def partial_denoise(self, params, x, cond, t, rng):
        """Noise to level t then denoise back (`model/diffusion.py:756-763`)."""
        k_q, k_loop = jax.random.split(rng)
        if t > 0:
            tv = jnp.full((x.shape[0],), t, dtype=jnp.int32)
            noise = jax.random.normal(k_q, x.shape, x.dtype)
            x_noisy = self.q_sample(x, tv, noise)
        else:
            x_noisy = x
        return self.p_sample_loop(
            params, x.shape, cond, k_loop, start_point=t, x_init=x_noisy
        )
