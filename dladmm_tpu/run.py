"""CLI entry: ``python -m dladmm_tpu.run --config=synthetic_small``.

Equivalent of the reference's experiment scripts (SURVEY.md R2/R7, N11):
trains the configured D-LADMM net and prints the NMSE-vs-layer table
against the classical LADMM baseline.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def main(argv=None) -> int:
    from dladmm_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # DLADMM_PLATFORM=cpu for smoke runs / outages
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="synthetic_small")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument(
        "--kernel",
        choices=["auto", "megakernel", "pallas", "reference"],
        default=None,
    )
    # "none" selects the final-layer-only loss (deep supervision is the
    # synthetic presets' default since round 2 — measured better in
    # BASELINE.md); "linear" is the final-heavy gamma_k ∝ k ramp;
    # default None keeps the preset's setting.
    ap.add_argument(
        "--layer-loss", choices=["uniform", "linear", "none"], default=None
    )
    ap.add_argument(
        "--clip-mode",
        choices=["global", "delayed"],
        default=None,
        help="clip_norm application: exact global-norm (two-pass) or "
        "one-step-delayed norm (single-pass, fuses into Adam — "
        "train/loop.delayed_clip_by_global_norm)",
    )
    ap.add_argument(
        "--vjp",
        choices=["auto", "manual", "xla"],
        default=None,
        help="backprop path through the unroll (ops/unroll_vjp.py)",
    )
    ap.add_argument(
        "--optimizer",
        choices=["adam", "fused_adam"],
        default=None,
        help="fused_adam runs the Adam update inside the reverse-scan "
        "backward, layer by layer (train/fused_adam.py); needs "
        "clip_mode=delayed when clip_norm is set",
    )
    ap.add_argument(
        "--moment-dtype",
        choices=[
            "float32",
            "bfloat16",
            "bfloat16_sr",
            "int8",
            "float32_pallas",
            "bfloat16_pallas",
            "bfloat16_sr_pallas",
            "bfloat16_sr_mu_pallas",
            "int8_pallas",
        ],
        default=None,
        help="storage precision of the Adam moments (train/qmoments.py):"
        " bfloat16/int8 shrink the bandwidth-bound optimizer sweep; the"
        " *_pallas variants apply the WHOLE optimizer in a one-HBM-pass"
        " fused kernel (train/qadam_pallas.py). Quality deltas measured"
        " in BASELINE.md",
    )
    ap.add_argument(
        "--prox-x",
        choices=["l1", "nonneg_l1", "elastic_net", "box", "group_l2"],
        default=None,
        help="proximal operator for the x update (ops/prox.py); non-l1 "
        "pairs train through the XLA scan + autodiff and the eval's "
        "LADMM comparison curve uses the same prox",
    )
    ap.add_argument(
        "--prox-z",
        choices=["l1", "nonneg_l1", "elastic_net", "box", "group_l2"],
        default=None,
        help="proximal operator for the z update",
    )
    ap.add_argument(
        "--prox-rho",
        type=float,
        default=None,
        help="elastic_net curvature rho (prox of theta*|.|_1 + "
        "rho/2*|.|^2); required > 0 with --prox-x/z=elastic_net "
        "(rho=0 IS l1)",
    )
    ap.add_argument(
        "--nonneg-x",
        action="store_true",
        help="generate nonnegative ground-truth x* (half-normal values) "
        "— pairs with --prox-x=nonneg_l1",
    )
    ap.add_argument(
        "--log-jsonl", default=None, help="append per-eval scalar records here"
    )
    ap.add_argument("--plot", default=None, help="save NMSE-vs-layer PNG here")
    ap.add_argument("--ckpt-dir", default=None, help="checkpoint directory")
    ap.add_argument(
        "--hbm-gb",
        type=float,
        default=None,
        help="per-chip HBM (GB) for the sharded-startup memory audit; "
        "default auto-detects from the device (v5e 16 / v4 32 / v5p 95)",
    )
    ap.add_argument(
        "--resume", action="store_true", help="resume from latest checkpoint"
    )
    ap.add_argument(
        "--accum-steps",
        type=int,
        default=None,
        help="gradient accumulation: scan this many microbatches of "
        "batch/accum_steps rows per update (fp32 grad accumulators) — "
        "train effective batches beyond HBM; single-device configs",
    )
    ap.add_argument(
        "--zero1",
        action="store_true",
        help="shard the optimizer state + weight update over the data "
        "axis (ZeRO-1 / cross-replica weight-update sharding) on "
        "DP-only sharded configs: per-chip Adam HBM and update "
        "traffic drop by data_axis, and clip_norm becomes the exact "
        "single-pass global clip",
    )
    ap.add_argument(
        "--eval-only",
        action="store_true",
        help="skip training: restore the latest --ckpt-dir checkpoint "
        "and report the NMSE-vs-layer table / plot / summary JSON "
        "(equivalent to --resume --steps=0)",
    )
    ap.add_argument(
        "--import-torch",
        default=None,
        metavar="CKPT",
        help="warm-start from a reference-style PyTorch checkpoint "
        "(utils/torch_compat.from_torch); the weights must match the "
        "config's problem shapes — combine with --steps for a short "
        "fine-tune or evaluation run",
    )
    ap.add_argument(
        "--allow-pickle",
        action="store_true",
        help="permit --import-torch to fully unpickle torch.save(net) "
        "whole-module checkpoints that the safe weights_only loader "
        "rejects (executes pickle code from the file — trusted files "
        "only)",
    )
    ap.add_argument(
        "--export-torch",
        default=None,
        metavar="CKPT",
        help="after training, torch.save the trained net in the "
        "reference's ParameterList state-dict layout",
    )
    ap.add_argument(
        "--greedy",
        action="store_true",
        help="greedy layer-wise training schedule (stage k trains the "
        "k-layer prefix) + end-to-end fine-tune, instead of pure "
        "end-to-end (SURVEY.md §10 Q5; measured comparison in "
        "BASELINE.md)",
    )
    args = ap.parse_args(argv)
    if args.eval_only:
        if not args.ckpt_dir:
            ap.error("--eval-only needs --ckpt-dir (a trained checkpoint)")
        if args.steps:
            ap.error("--eval-only contradicts --steps (it trains nothing)")
        args.steps, args.resume = 0, True

    from dladmm_tpu.utils.config import get_config

    cfg = get_config(args.config)
    overrides = {}
    for f in (
        "steps",
        "batch",
        "lr",
        "seed",
        "kernel",
        "vjp",
        "clip_mode",
        "optimizer",
        "moment_dtype",
        "accum_steps",
    ):
        v = getattr(args, f)
        if v is not None:
            overrides[f] = v
    if args.layer_loss is not None:
        overrides["layer_loss"] = (
            None if args.layer_loss == "none" else args.layer_loss
        )
    if overrides:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **overrides)
        )
    prob_overrides = {}
    for src, dst in (("prox_x", "prox_x"), ("prox_z", "prox_z")):
        v = getattr(args, src)
        if v is not None:
            prob_overrides[dst] = v
    if args.prox_rho is not None:
        prob_overrides["prox_rho"] = args.prox_rho
    if args.nonneg_x:
        prob_overrides["nonneg_x"] = True
    if prob_overrides:
        cfg = dataclasses.replace(
            cfg, problem=dataclasses.replace(cfg.problem, **prob_overrides)
        )
    # elastic_net with rho=0 IS l1 (is_l1() classifies it so) — the flag
    # would silently have no effect; require an explicit rho (ADVICE r3).
    if "elastic_net" in (cfg.problem.prox_x, cfg.problem.prox_z) and (
        cfg.problem.prox_rho == 0.0
    ):
        ap.error(
            "prox=elastic_net needs --prox-rho > 0 (rho=0 reduces to l1; "
            "pass --prox-x=l1 if that is what you want)"
        )

    from dladmm_tpu.utils.logging import JsonlLogger
    from dladmm_tpu.train.loop import fit

    logger = JsonlLogger(args.log_jsonl)
    from dladmm_tpu.models.api import select_forward

    def report(last, mesh=None):
        """Shared tail: optional curve plot, per-layer NMSE table vs the
        classical-LADMM baseline, one summary JSON line."""
        curves = last["curves"]
        if args.plot:
            from dladmm_tpu.utils.plots import save_nmse_curve_plot

            title = f"{cfg.name}: NMSE vs layer (K={cfg.problem.K}"
            title += f", mesh {mesh})" if mesh else ")"
            save_nmse_curve_plot(
                args.plot,
                [float(v) for v in curves["nmse_curve_db"]],
                [float(v) for v in curves["ladmm_curve_db"]],
                title=title,
            )
            print(f"plot saved: {args.plot}")
        hdr = f"\nconfig={cfg.name}  steps={cfg.train.steps}"
        print(hdr + (f"  mesh={mesh}" if mesh else ""))
        print(
            f"{'layer':>5} {'D-LADMM NMSE(dB)':>18} {'LADMM NMSE(dB)':>16}"
        )
        for k, (a, b) in enumerate(
            zip(curves["nmse_curve_db"], curves["ladmm_curve_db"]), 1
        ):
            print(f"{k:>5} {float(a):>18.2f} {float(b):>16.2f}")
        payload = {
            "final_nmse_db": last["nmse_db"],
            "final_residual": last["residual"],
            "ladmm_nmse_db_at_K": float(curves["ladmm_curve_db"][-1]),
        }
        if mesh:
            payload["mesh"] = mesh
        print(json.dumps(payload))

    p = cfg.problem
    s = cfg.sharding
    init_params = None
    if args.import_torch:
        if s.data_axis * s.model_axis > 1 or args.greedy:
            ap.error(
                "--import-torch warm-starts the single-device fit only; "
                "use utils.torch_compat.from_torch + fit_sharded's "
                "checkpoint path for sharded configs"
            )
        from dladmm_tpu.utils.torch_compat import from_torch

        init_params = from_torch(
            args.import_torch, allow_pickle=args.allow_pickle
        )
        print(
            f"imported torch checkpoint {args.import_torch} "
            f"(K={init_params.K})",
            flush=True,
        )
    if args.zero1:
        if s.data_axis <= 1 or s.model_axis > 1:
            ap.error(
                "--zero1 applies to DP-only sharded configs "
                f"(data_axis > 1, model_axis == 1); config {cfg.name!r} "
                f"is {s.data_axis}x{s.model_axis}"
            )
        cfg = dataclasses.replace(
            cfg, sharding=dataclasses.replace(s, zero1=True)
        )
        s = cfg.sharding
    if s.data_axis * s.model_axis > 1:
        if args.greedy:
            ap.error(
                "--greedy is single-device only (layer-wise stages have "
                "no sharded implementation); unset it for config "
                f"{cfg.name!r}"
            )
        if args.export_torch:
            ap.error(
                "--export-torch is single-device only; checkpoint the "
                "sharded run (--ckpt-dir) and export from the restored "
                "params instead"
            )
        # Sharded presets (tp_small, tp_large, multihost): DP x TP mesh
        # training with explicit collectives. The full flag surface
        # applies — fit_sharded composes bf16/layer-loss/freeze/ckpt
        # with sharding, and kernel/vjp select the per-shard path on
        # DP-only meshes (fit_sharded rejects non-auto values when
        # model_axis > 1, where the TP scan is the only forward).
        from dladmm_tpu.train.loop import fit_sharded

        _, history = fit_sharded(
            cfg,
            log_fn=logger,
            ckpt_dir=args.ckpt_dir,
            resume=args.resume,
            hbm_bytes=args.hbm_gb and args.hbm_gb * 1e9,
        )
        last = history[-1]
        report(last, mesh=last["mesh"])
        return 0

    if args.greedy:
        # fit_greedy selects kernels/precision per phase itself (the
        # stage losses use the final-state contract, the fine-tune the
        # trajectory contract) — run.py's generic selection would be
        # wrong for the stages, so it is skipped entirely here.
        if args.ckpt_dir or args.resume:
            ap.error("--greedy does not support --ckpt-dir/--resume")
        if not p.identity_B:
            ap.error(
                "--greedy supports the identity-B benchmarks only; "
                f"train config {cfg.name!r} without it"
            )
        if cfg.train.optimizer == "fused_adam":
            ap.error(
                "--greedy has no fused-optimizer implementation (stage "
                "losses run the optax chain); drop --optimizer=fused_adam"
            )
        from dladmm_tpu.train.loop import fit_greedy

        print("kernel path: greedy (per-stage auto-selection)", flush=True)
        params, history = fit_greedy(cfg, log_fn=logger)
        report(history[-1])
        if args.export_torch:
            from dladmm_tpu.utils.torch_compat import save_torch

            save_torch(params, args.export_torch)
            print(f"torch export saved: {args.export_torch}")
        return 0

    from dladmm_tpu.train.loop import resolve_prox

    if resolve_prox(p) is not None:
        # General proximal operators (ops/prox.py): fit() builds the
        # prox layer step itself (ops/reference.make_cached_step) and
        # routes through the XLA scan + autodiff; the fused Pallas
        # kernels and the manual reverse-scan VJP are l1-specialized.
        if cfg.train.kernel not in ("auto", "reference"):
            ap.error(
                f"--kernel={cfg.train.kernel} covers the l1/l1 "
                "instantiation only; general-prox configs run the XLA "
                "scan"
            )
        if cfg.train.optimizer == "fused_adam":
            ap.error(
                "--optimizer=fused_adam hand-writes the l1 backward; "
                "general-prox configs use the optax chain"
            )
        if cfg.train.vjp != "auto":
            ap.error(
                "general-prox configs route through XLA autodiff "
                "automatically; drop --vjp"
            )
        forward_fn, step_fn = None, None
        desc = (
            f"xla-scan + autodiff (prox {p.prox_x}/{p.prox_z}"
            + (", general B" if not p.identity_B else "")
            + ")"
        )
    elif not p.identity_B:
        # General z-dictionary B: the fused Pallas forwards assume B = I
        # (SURVEY.md §2 point 4), so the forward is the XLA scan and the
        # backward the manual general-B reverse scan (ops/unroll_vjp.py)
        # via loss_fn's vjp="auto"/"manual" routing.
        if cfg.train.kernel not in ("auto", "reference"):
            ap.error(
                f"--kernel={cfg.train.kernel} requires identity B; the "
                f"general-B config {cfg.name!r} runs the XLA scan + "
                "manual reverse-scan VJP"
            )
        if cfg.train.vjp == "xla" and cfg.train.optimizer == "fused_adam":
            ap.error("--optimizer=fused_adam is a manual-VJP step; "
                     "--vjp=xla contradicts it")
        forward_fn, step_fn = None, None
        desc = "xla-scan + manual general-B reverse-scan vjp"
        if cfg.train.optimizer == "fused_adam":
            desc += " + fused Adam-in-backward"
    elif cfg.train.optimizer == "fused_adam":
        # The fused optimizer owns the whole step (forward scan +
        # reverse scan with in-body Adam) — exclusive with Pallas
        # forward selection and with forcing XLA autodiff.
        if cfg.train.vjp == "xla":
            ap.error("--optimizer=fused_adam is a manual-VJP step; "
                     "--vjp=xla contradicts it")
        if cfg.train.kernel != "auto":
            ap.error(
                "--optimizer=fused_adam uses the XLA-scan forward; "
                f"--kernel={cfg.train.kernel} does not apply"
            )
        forward_fn, step_fn = None, None
        desc = "manual reverse-scan + fused Adam-in-backward"
    elif cfg.train.vjp == "manual":
        # The manual reverse-scan VJP replaces the whole forward+backward;
        # it is exclusive with megakernel/fused-step forward selection.
        forward_fn, step_fn, desc = None, None, "manual-vjp-reverse-scan"
    elif cfg.train.vjp == "xla":
        # Forcing XLA autodiff also means no Pallas forward: the
        # megakernel/fused-step custom_vjps route through the manual
        # backward, which would defeat the comparison.
        forward_fn, step_fn, desc = None, None, "xla-scan-autodiff"
    else:
        forward_fn, step_fn, desc = select_forward(
            p.m,
            p.n,
            p.m,
            # VMEM eligibility is per-microbatch under accumulation.
            cfg.train.batch // cfg.train.accum_steps,
            kernel=cfg.train.kernel,
            need_trajectory=cfg.train.layer_loss is not None,
        )
    print(f"kernel path: {desc}", flush=True)

    params, history = fit(
        cfg,
        log_fn=logger,
        step_fn=step_fn,
        forward_fn=forward_fn,
        ckpt_dir=args.ckpt_dir,
        resume=args.resume,
        init_params=init_params,
    )
    report(history[-1])
    if args.export_torch:
        from dladmm_tpu.utils.torch_compat import save_torch

        save_torch(params, args.export_torch)
        print(f"torch export saved: {args.export_torch}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
