"""Entry point: `python -m tcdiff_tpu.cli.train --mode {train,val_without_TrajModel,test}`.

The reference's `train.py:8-25` dispatch, over the TPU orchestrator.
"""

from __future__ import annotations

from tcdiff_tpu.cli.args import config_from_opt, parse_train_opt
from tcdiff_tpu.train.orchestrator import TCDiff


def main(argv=None):
    from tcdiff_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # TCDIFF_PLATFORM=cpu keeps a local run off the chip
    opt = parse_train_opt(argv)
    cfg = config_from_opt(opt)
    from tcdiff_tpu.utils import increment_path, maybe_init_multihost

    maybe_init_multihost()  # DCN multi-host when a coordinator is configured
    if opt.mode == "train" and not opt.checkpoint:
        # non-clobbering run dirs, like the reference's increment_path
        import os

        opt.exp_name = os.path.basename(
            str(increment_path(os.path.join(opt.project, opt.exp_name)))
        )
    runner = TCDiff(
        cfg,
        checkpoint_path=opt.checkpoint or None,
        use_ema_for_eval=opt.mode != "train",
    )
    if opt.mode == "train":
        runner.train_loop(opt)
    elif opt.mode == "val_without_TrajModel":
        runner.given_trajectory_generation_loop(opt)
    elif opt.mode == "test":
        runner.test_loop(opt)
    elif opt.mode == "eval":
        runner.evaluate_loop(opt)
    elif opt.mode == "generate":
        assert opt.wav, "--mode generate needs --wav <file>"
        if runner.normalizer is None:  # no checkpoint: synthetic stats
            runner.normalizer = runner.load_datasets(opt)[0].normalizer
        if opt.streaming:
            runner.generate_streaming(opt.wav, opt)
        else:
            runner.generate(opt.wav, opt)
    return runner


if __name__ == "__main__":
    main()
