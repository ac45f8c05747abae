"""A/B harness for the TL/AD kernel scheduling experiments (DESIGN.md §8).

Reproduces, on the real chip, the measured comparisons behind the
round-2 scheduling conclusions:

    python tools/kernel_ab.py two:64 two:128 chunk:64:2 chunk:32:4 fused:64

Config syntax (one timing line each, chained-accumulator methodology):

- ``two:<S>``      — the production two-kernel dscale work unit
                     (TL with checkpoint streams + reverse-only adjoint)
                     at sublanes S; S>64 needs the raised VMEM budget,
                     applied automatically.
- ``chunk:<S>:<C>``— same, with C-level grid chunks (chunk_levels=C).
- ``fused:<S>``    — the single-call fused kernel with VMEM-resident
                     checkpoints+seeds (cloudsc2_pallas_tlad_fused).
- ``enc:<S>``      — the int16 encoded-stream work unit (VERDICT r2
                     item 2: byte diet on the byte-heavy TL/AD mixes);
                     inputs pre-encoded outside the timed step.
- ``noprim:<S>``   — work unit without the 8 primal output streams
                     (unused by the reference AD driver's verification
                     norms, cloudsc_driver_ad_mod.F90:160-256).
- ``encnp:<S>``    — both diets combined (encoded + no primal).
- ``xscat:<S>``    — the round-2..4 adjoint output convention
                     (17 shifted-view streams + XLA concatenate/add
                     assembly of d_plu/d_paph) instead of the in-kernel
                     shift-scatter accumulation that is now the default
                     (tlad_kernel inplace_scatter; ROOFLINE.md §3's
                     2.53 GB glue lever).  A/B against ``two:<S>``.
- ``xscatnp:<S>``  — same, without the primal streams (A/B against
                     ``noprim:<S>`` — the headline contract).

Measured results are environment-sensitive (±10% tunnel variance) —
compare configs from the SAME invocation only.  Round-2 reference
numbers (163 840 cols, v5e): two:64 21.8 ms, two:128 21.4, chunk:64:2
22.3, chunk:32:4 21.6, fused:64 25.3 — i.e. every alternative is a
null or a loss; see DESIGN.md §8.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cloudsc2jax.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

NGPTOT = int(os.environ.get("CLOUDSC2_AB_NGPTOT", 163840))
REPS = int(os.environ.get("CLOUDSC2_AB_REPS", 8))
VMEM = 100 * 1024 * 1024


def _step_fn(cfg, params):
    from cloudsc2jax.pallas.experiments import cloudsc2_pallas_tlad_fused
    from cloudsc2jax.pallas.tlad_kernel import (
        cloudsc2_pallas_ad,
        cloudsc2_pallas_tl,
    )

    kind, *args = cfg.split(":")
    S = int(args[0])
    C = int(args[1]) if len(args) > 1 else 1
    vl = VMEM if (kind == "fused" or S > 64 or S * C > 64) else None

    def work(i):
        if kind == "fused":
            return cloudsc2_pallas_tlad_fused(i, params, lregcl=True,
                                              sublanes=S)
        if kind in ("enc", "encnp"):
            from cloudsc2jax.pallas.experiments import (
                cloudsc2_pallas_ad_encoded,
                cloudsc2_pallas_tl_encoded,
            )

            out, dout, ckpts = cloudsc2_pallas_tl_encoded(
                i, params, dscale=0.01, lregcl=True, vmem_limit_bytes=vl,
                write_primal=(kind == "enc"),
            )
            _, adj = cloudsc2_pallas_ad_encoded(
                i, dout, params, checkpoints=ckpts, lregcl=True,
                fold_seeds=True, vmem_limit_bytes=vl,
            )
            return out, dout, adj
        out, dout, ckpts = cloudsc2_pallas_tl(
            i, None, params, lregcl=True, sublanes=S, blocked=True,
            save_checkpoints=True, dscale=0.01, chunk_levels=C,
            vmem_limit_bytes=vl,
            write_primal=(kind not in ("noprim", "xscatnp")),
        )
        _, adj = cloudsc2_pallas_ad(
            i, dout, params, lregcl=True, sublanes=S, blocked=True,
            checkpoints=ckpts, fold_seeds=True, chunk_levels=C,
            inplace_scatter=(False if kind.startswith("xscat") else None),
            vmem_limit_bytes=vl,
        )
        return out, dout, adj

    # the work unit's contract must be FORCED, with nothing beyond it:
    # schedules whose d_plu/d_paph leave as XLA concatenate/add passes
    # (xscat*, chunked, the experiments) need full sums of those two
    # arrays (a slice probe would let XLA rewrite slice(concat) and DCE
    # the assembly); the in-kernel scatter schedules only have the
    # one-row surface add left — consuming that row forces it, and a
    # full-array sum would bill them ~0.4 GB of pure probe overhead
    xla_assembled = kind in ("xscat", "xscatnp", "fused", "enc",
                             "encnp") or C > 1

    def scalar_step(v):
        out = work(v)
        adj = out[2]
        if xla_assembled:
            extra = (jnp.sum(adj.paph.astype(jnp.float32))
                     + jnp.sum(adj.plu.astype(jnp.float32)))
        else:
            extra = (jnp.sum(adj.paph[-1].astype(jnp.float32))
                     + jnp.sum(jnp.ravel(adj.plu)[:2]))
        return extra + sum(
            jnp.sum(jnp.ravel(o)[:2]) for o in jax.tree.leaves(out)
        )

    return jax.jit(scalar_step), S


def main(argv):
    import json

    from cloudsc2jax.state import Cloudsc2State

    assert jax.devices()[0].platform == "tpu", (
        "run from /root/repo in a TPU-visible shell")
    configs = argv or ["two:64", "chunk:64:2", "fused:64"]
    state = Cloudsc2State.synthetic(ngptot=100, nlev=137)
    rng = np.random.default_rng(time.time_ns())
    results = {}
    for cfg in configs:
        key = cfg
        n = 2
        while key in results:  # repeated configs are drift controls
            key = f"{cfg}#{n}"
            n += 1
        try:
            step, S = _step_fn(cfg, state.params)
            inputs = state.device_kernel_inputs(
                NGPTOT, dtype=np.float32, blocked_sublanes=S
            )
            variants = [
                inputs._replace(pt=inputs.pt + np.float32(
                    1e-6 * rng.uniform(0.5, 1.5) * (i + 1)))
                for i in range(REPS)
            ]
            if cfg.split(":")[0] in ("enc", "encnp"):
                # storage-encoding premise: data lives encoded in HBM —
                # encode each variant OUTSIDE the timed step (the bump
                # lands in the decode-table offset row via re-encoding)
                from functools import partial

                from cloudsc2jax.pallas.experiments import (
                    encode_blocked_inputs,
                )

                encf = jax.jit(partial(encode_blocked_inputs,
                                       params=state.params,
                                       fuse_satur=False))
                variants = [encf(v) for v in variants]
                jax.block_until_ready(variants[-1])
            # throwaway chained warm-up (first chained sequence in a
            # process runs ~2.5x slow, DESIGN.md §7)
            acc = jnp.float32(0.0)
            for v in variants[:4]:
                acc = acc + step(v)
            float(acc)
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for v in variants:
                acc = acc + step(v)
            float(acc)
            dt = (time.perf_counter() - t0) / REPS
            print(f"{cfg}: {dt * 1e3:.2f} ms  "
                  f"{NGPTOT / dt / 1e6:.2f} M cols/s", flush=True)
            results[key] = {"ms": round(dt * 1e3, 2),
                            "mcols_per_s": round(NGPTOT / dt / 1e6, 2)}
        except Exception as e:  # keep sweeping past VMEM/compile failures
            print(f"{cfg}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            results[key] = {"failed": f"{type(e).__name__}: {str(e)[:200]}"}
        finally:
            # free this config's device buffers before the next one: at
            # headline NGPTOT each config's REPS input variants are
            # multi-GB, and letting them accumulate OOMs HBM by the
            # third config (seen at 327680: RESOURCE_EXHAUSTED)
            inputs = variants = None
    # one machine-readable summary line (same-invocation numbers are the
    # only comparable ones — ±10% tunnel variance across runs); consumed
    # by tools/onchip_evidence.py
    print(json.dumps({"platform": "tpu", "ngptot": NGPTOT, "reps": REPS,
                      "configs": results}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
