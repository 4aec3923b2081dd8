"""Analytic matmul-FLOP roofline for the discriminative TRAIN step
(vitl @ 518 px, batch 8, bf16, remat='attn') vs v5e peaks — the training
counterpart of the serving roofline table in docs/ROADMAP.md.

Accounting rules (mirrors the serving table's method):
- trunk matmuls per ViT block: qkv 6*N*D^2, proj 2*N*D^2,
  MLP fc1+fc2 16*N*D^2 (vitl ffn='mlp', hidden 4D)  -> 24*N*D^2 fwd
- attention per block: QK^T + PV = 4*N^2*D fwd, derated to 50% of MXU
  nameplate (contraction/output depth 64 of the 128-deep array)
- backward: matmuls 2x fwd (dX + dW); flash attention bwd is the
  two-kernel design (dq + dkv), each recomputing QK^T/softmax from the
  saved LSE: ~2.5x fwd attention FLOPs
- remat='attn' saves ONLY the attention out/LSE, so backward re-runs
  every block's non-attention forward once more: +24*N*D^2 per block
- DPT head: measured MXU efficiency ~80% on v5e (ROADMAP); fwd FLOPs
  scaled from the 1022 px serving measurement, bwd = 2x fwd
- optimizer (Adam, f32 state): pure HBM traffic, ~8 bytes moved per
  param-float per step at 819 GB/s

Run on any host (pure arithmetic, no jax):
    python benchmarks/train_roofline.py
"""

MXU_BF16_TFS = 197.0          # v5e nameplate
HBM_GBS = 819.0
ATTN_DEPTH_DERATE = 0.5       # head dim 64 on a 128-deep systolic array
HEAD_MXU_EFF = 0.80           # measured (ROADMAP "DPT-head conv tuning")

B, L, D, FFN_MULT = 8, 24, 1024, 4
N = 1408                      # pad_seq_len(37*37+1 = 1370) at 518 px
PARAMS_M = 357                # AmodalDAv2 vitl total (tests/test_param_counts)

# measured step time (runbook v7, eff_bs regime row: 499.5; canonical 497)
MEASURED_MS = 497.0
# measured serving-side vitl head fwd: 118 ms @1022 b8 -> scale by area
HEAD_FWD_MS_1022 = 118.0
HEAD_FWD_MS = HEAD_FWD_MS_1022 * (518 / 1022) ** 2


def tf(x):
    return x / 1e12


def main():
    per_blk_mm = 24 * N * D * D            # fwd matmul FLOPs / block / sample
    per_blk_attn = 4 * N * N * D
    # fwd + remat re-forward + bwd(2x) = 4x block matmuls
    mm_total = 4 * per_blk_mm * L * B
    # fwd + bwd(~2.5x) = 3.5x attention
    attn_total = 3.5 * per_blk_attn * L * B

    mm_sol_ms = tf(mm_total) / MXU_BF16_TFS * 1e3
    attn_sol_ms = tf(attn_total) / (MXU_BF16_TFS * ATTN_DEPTH_DERATE) * 1e3

    # head: fwd measured at ~80% MXU eff; SoL = measured*eff; train = 3x fwd
    head_train_sol_ms = 3 * HEAD_FWD_MS * HEAD_MXU_EFF

    # Adam: read params+grads+mu+nu, write params+mu+nu (f32) = 7 floats
    # r/w per param + bf16 compute-cast write ~ 0.5 -> ~30 bytes/param
    opt_bytes = PARAMS_M * 1e6 * 30
    opt_ms = opt_bytes / (HBM_GBS * 1e9) * 1e3

    rows = [
        ("trunk matmuls (fwd+remat+bwd)", tf(mm_total), mm_sol_ms),
        ("attention fwd+bwd (50% depth)", tf(attn_total), attn_sol_ms),
        ("DPT head fwd+bwd (80% meas eff)", None, head_train_sol_ms),
        ("Adam update (HBM-bound)", None, opt_ms),
    ]
    total_sol = sum(r[2] for r in rows)
    print(f"{'segment':38s} {'TF':>7s} {'SoL ms':>8s}")
    for name, f, ms in rows:
        print(f"{name:38s} {f if f else 0:7.1f} {ms:8.1f}")
    print(f"{'TOTAL (depth-adjusted SoL)':38s} {'':>7s} {total_sol:8.1f}")
    print(f"measured {MEASURED_MS:.0f} ms -> efficiency "
          f"{total_sol / MEASURED_MS * 100:.0f}% "
          f"({MEASURED_MS / total_sol:.2f}x of SoL)")


if __name__ == "__main__":
    main()
