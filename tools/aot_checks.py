"""Chipless AOT compile checks against the axon TPU client (outage playbook).

`jax.jit(f).lower(args).compile()` exercises the FULL Mosaic pipeline
(scoped-VMEM accounting, lane layouts) at real shapes without ever touching
the chip — during the 2026-08-17 backend outage this was the only way to
validate kernels (BENCH_NOTES r3). Promoted to tools/ per VERDICT r3 #8.

Usage (one mode per process; each cold axon client init is minutes):
  python tools/aot_checks.py kernels        # 3 train kernels fwd+bwd, real shapes
  python tools/aot_checks.py sharded_train  # full train step, kernels ON,
                                            # shard_map-wrapped (VERDICT r3 #4)
  python tools/aot_checks.py layer          # whole-layer serving program
                                            # (ops/fused_layer.py) at real
                                            # shapes — the scoped-VMEM gate
  python tools/aot_checks.py combos         # FULL train step at batch 64 for
                                            # every TCDIFF_TRAIN_{SAB,XAB,FFB}
                                            # combination a user can enable —
                                            # scoped-VMEM demand depends on the
                                            # XLA context AROUND a kernel, not
                                            # just the kernel: SAB's K5 fit in
                                            # the ALL3 module but OOM'd by
                                            # 668 KB next to the XLA FF
                                            # backward (r4b arm TRAIN_SAB_XAB)
                                            # until it was row-blocked.
                                            # AOT_COMBOS=SAB_XAB,FFB limits the
                                            # sweep.

`sharded_train` threads a mesh into the model with
TCDIFF_KERNEL_SHARD_FORCE=1, so the Pallas programs lower inside
shard_map's manual-SPMD context exactly as they would on a dp>1 mesh
(minus the ICI psum); with only one real chip this is the strongest
on-hardware evidence available that the GSPMD wrap compiles. The psum'd
multi-device execution itself is covered by the virtual-mesh equality test
(tests/test_train_kernels_sharded.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_kernels():
    import jax
    import jax.numpy as jnp

    from tcdiff_tpu.ops.fused_ca_block_train import fused_ca_block_train
    from tcdiff_tpu.ops.fused_ff_block_train import fused_ff_tail_train
    from tcdiff_tpu.ops.fused_sa_block_train import fused_sa_block_train, sa_train_tables

    b, L, Lm, d, hd, ff, nhead = 2, 450, 152, 512, 512, 1024, 8
    cd = jnp.bfloat16
    x = jnp.zeros((b, L, d), cd)
    mem = jnp.zeros((b, Lm, d), cd)
    cosx, ssinx = sa_train_tables(x, jnp.zeros((L, d), jnp.float32), d)
    cosm, ssinm = sa_train_tables(mem, jnp.zeros((Lm, d), jnp.float32), d)
    seeds = jnp.zeros((b,), jnp.uint32)
    W = lambda *s: jnp.zeros(s, cd)
    V = lambda n: jnp.zeros((n,))
    R = lambda: jnp.zeros((b, d))

    cases = {}
    cases["SAB"] = (lambda x, wq, wk, wv, wfc, s1, b1, s2, b2, fs, fb: jnp.sum(
        fused_sa_block_train(x, s1, b1, cosx, ssinx, wq, wk, wv, wfc, s2, b2,
                             fs, fb, seeds, nhead, 0.1, 1e-5, 1e-6).astype(jnp.float32) ** 2),
        (x, W(d, hd), W(d, hd), W(d, hd), W(hd, d), V(d), V(d), V(d), V(d), R(), R()))
    cases["FFB"] = (lambda x, w1, bb1, w2, bb2, w3, bb3, s3, b3, s4, b4, fs, fb: jnp.sum(
        fused_ff_tail_train(x, s3, b3, w1, bb1, w2, bb2, fs, fb, s4, b4, w3, bb3,
                            seeds, 0.1, 1e-5).astype(jnp.float32) ** 2),
        (x, W(d, ff), V(ff), W(ff, d), V(d), W(d, d), V(d), V(d), V(d), V(d), V(d), R(), R()))
    cases["XAB"] = (lambda x, mem, wq, wk, wv, wfc, s2, b2, ss, sb, fs, fb: jnp.sum(
        fused_ca_block_train(x, mem, s2, b2, cosx, ssinx, cosm, ssinm,
                             wq, wk, wv, wfc, ss, sb, fs, fb, seeds,
                             nhead, 0.1, 1e-5, 1e-6).astype(jnp.float32) ** 2),
        (x, mem, W(d, hd), W(d, hd), W(d, hd), W(hd, d), V(d), V(d), V(d), V(d), R(), R()))

    for name, (fn, args) in cases.items():
        try:
            jax.jit(jax.grad(fn, argnums=tuple(range(len(args))))).lower(*args).compile()
            print(f"{name} fwd+bwd: COMPILE OK", flush=True)
        except Exception as e:
            s = str(e)
            i = s.find("ERROR")
            print(f"{name} FAIL:", (s[i:i + 1200] if i >= 0 else s[-1200:]), flush=True)


def check_sharded_train():
    os.environ["TCDIFF_KERNEL_SHARD_FORCE"] = "1"
    for var in ("TCDIFF_TRAIN_SAB", "TCDIFF_TRAIN_XAB", "TCDIFF_TRAIN_FFB"):
        os.environ[var] = "1"

    import jax
    import jax.numpy as jnp

    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder
    from tcdiff_tpu.optim import adan
    from tcdiff_tpu.parallel import make_mesh
    from tcdiff_tpu.train import create_train_state, make_train_step

    cfg = DanceDecoderConfig(dancer_num=3)
    mesh = make_mesh()  # 1 device; FORCE makes the kernels shard_map anyway
    model = DanceDecoder(cfg, dtype=jnp.bfloat16, mesh=mesh)
    diff = GaussianDiffusion(model, DiffusionConfig())
    tokens = cfg.seq_len * cfg.dancer_num
    batch = int(os.environ.get("AOT_BATCH", "64"))
    params = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, tokens, cfg.nfeats)),
            jnp.zeros((1, 301, cfg.cond_feature_dim)), jnp.zeros((1,), jnp.int32),
        )["params"],
        jax.random.key(0),
    )
    tx = adan(5e-5, weight_decay=0.02)
    # tx must stay closed-over, not traced: its function leaves cannot be
    # abstractified by eval_shape
    state = jax.eval_shape(lambda p: create_train_state(p, tx), params)
    x = jax.ShapeDtypeStruct((batch, cfg.dancer_num, cfg.seq_len, cfg.nfeats), jnp.float32)
    cond = jax.ShapeDtypeStruct((batch, 301, cfg.cond_feature_dim), jnp.float32)
    key = jax.eval_shape(jax.random.key, 0)
    step = make_train_step(diff, tx)
    try:
        jax.jit(step, donate_argnums=0).lower(state, x, cond, key).compile()
        print("sharded_train (kernels ON, shard_map FORCE, batch "
              f"{batch}): COMPILE OK", flush=True)
    except Exception as e:
        s = str(e)
        i = s.find("ERROR")
        print("sharded_train FAIL:", (s[i:i + 1500] if i >= 0 else s[-1500:]), flush=True)
        sys.exit(1)


def _combo_name(sab, xab, ffb):
    on = [n for n, v in (("SAB", sab), ("XAB", xab), ("FFB", ffb)) if v]
    return "_".join(on) if on else "NONE"


def check_combos():
    """Compile the FULL train step (batch 64 bf16, real widths, no mesh —
    the exact single-chip bench configuration) once per train-kernel flag
    combination. VERDICT r4 #3: the per-kernel check compiles each program
    standalone at batch 2, but the toolchain's scoped-VMEM accounting also
    depends on the surrounding module, so only whole-step compiles catch
    combination regressions chiplessly."""
    import jax
    import jax.numpy as jnp

    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder
    from tcdiff_tpu.optim import adan
    from tcdiff_tpu.train import create_train_state, make_train_step

    want = os.environ.get("AOT_COMBOS")
    want = None if not want else set(want.split(","))
    batch = int(os.environ.get("AOT_BATCH", "64"))
    cfg = DanceDecoderConfig(dancer_num=3)
    tokens = cfg.seq_len * cfg.dancer_num
    params = jax.eval_shape(
        lambda k: DanceDecoder(cfg, dtype=jnp.bfloat16).init(
            k, jnp.zeros((1, tokens, cfg.nfeats)),
            jnp.zeros((1, 301, cfg.cond_feature_dim)), jnp.zeros((1,), jnp.int32),
        )["params"],
        jax.random.key(0),
    )
    tx = adan(5e-5, weight_decay=0.02)
    state = jax.eval_shape(lambda p: create_train_state(p, tx), params)
    x = jax.ShapeDtypeStruct((batch, cfg.dancer_num, cfg.seq_len, cfg.nfeats), jnp.float32)
    cond = jax.ShapeDtypeStruct((batch, 301, cfg.cond_feature_dim), jnp.float32)
    key = jax.eval_shape(jax.random.key, 0)

    failed = []
    for sab in (1, 0):
        for xab in (1, 0):
            for ffb in (1, 0):
                name = _combo_name(sab, xab, ffb)
                if want is not None and name not in want:
                    continue
                os.environ["TCDIFF_TRAIN_SAB"] = str(sab)
                os.environ["TCDIFF_TRAIN_XAB"] = str(xab)
                os.environ["TCDIFF_TRAIN_FFB"] = str(ffb)
                # flags are read at trace time inside model.apply — a fresh
                # jit object per combo forces a fresh trace
                model = DanceDecoder(cfg, dtype=jnp.bfloat16)
                diff = GaussianDiffusion(model, DiffusionConfig())
                step = make_train_step(diff, tx)
                try:
                    jax.jit(step, donate_argnums=0).lower(state, x, cond, key).compile()
                    print(f"combo {name}: COMPILE OK", flush=True)
                except Exception as e:
                    failed.append(name)
                    s = str(e)
                    i = s.find("ERROR")
                    print(f"combo {name} FAIL:",
                          (s[i:i + 1200] if i >= 0 else s[-1200:]), flush=True)
    if failed:
        sys.exit(f"combos FAILED: {','.join(failed)}")
    print("all requested combos: COMPILE OK", flush=True)


def check_layer():
    import jax
    import jax.numpy as jnp

    from tcdiff_tpu.ops.fused_layer import fused_layer

    b, L, Lm, d, hd, ff, nhead = 2, 450, 152, 512, 512, 1024, 8
    cd = jnp.bfloat16
    x = jnp.zeros((b, L, d), cd)
    angles = jnp.zeros((L, d), jnp.float32)
    W = lambda *s: jnp.zeros(s, cd)
    V = lambda n: jnp.zeros((n,))
    R = lambda: jnp.zeros((b, d))
    KV = lambda: jnp.zeros((b, Lm, hd), cd)
    for include_ff, name in ((True, "layer FULL"), (False, "layer SA+CA")):
        args = (
            x, angles,
            V(d), V(d), W(d, hd), W(d, hd), W(d, hd), W(hd, d), V(d), V(d),
            R(), R(),
            V(d), V(d), W(d, hd), W(hd, d), V(d), V(d), KV(), KV(), R(), R(),
            V(d), V(d), W(d, ff), V(ff), W(ff, d), V(d), R(), R(),
            V(d), V(d), W(d, d), V(d),
        )
        try:
            jax.jit(
                lambda *a: fused_layer(*a, nhead=nhead, include_ff=include_ff)
            ).lower(*args).compile()
            print(f"{name}: COMPILE OK", flush=True)
        except Exception as e:
            s = str(e)
            i = s.find("ERROR")
            print(f"{name} FAIL:", (s[i:i + 1500] if i >= 0 else s[-1500:]), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernels"
    if mode == "kernels":
        check_kernels()
    elif mode == "sharded_train":
        check_sharded_train()
    elif mode == "layer":
        check_layer()
    elif mode == "combos":
        check_combos()
    else:
        sys.exit(f"unknown mode {mode!r}")
