"""Entry point: `python -m tcdiff_tpu.cli.train_traj` — DBN trainer CLI.

Mirrors `/root/reference/TrajDecoder/train_traj.py` +
`TrajDecoder/options/option_traj.py:3-70`.
"""

from __future__ import annotations

import argparse

from tcdiff_tpu.config import TrajDecoderConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="tcdiff_tpu DBN (TrajDecoder) trainer")
    # reference option_traj surface
    p.add_argument("--data_path", type=str, default="./data/AIOZ_Dataset/")
    p.add_argument("--out_dir", type=str, default="./runs/traj")
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--nfeats", type=int, default=2)
    p.add_argument("--trans_layer", type=int, default=6)
    p.add_argument("--window_size", type=int, default=100)
    p.add_argument("--step", type=int, default=25)
    p.add_argument("--total_iter", type=int, default=800_000)
    p.add_argument("--print_iter", type=int, default=5000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--gamma", type=float, default=0.05)
    p.add_argument("--lr_scheduler", type=int, nargs="+", default=[60_000])
    p.add_argument("--weight_decay", type=float, default=1e-6)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--required_dancer_num", type=int, default=3)
    p.add_argument("--split_file", type=str, default=None)
    # TPU-build extras
    p.add_argument("--synthetic", action="store_true", default=False)
    p.add_argument("--synthetic_size", type=int, default=16)
    p.add_argument("--seq_len", type=int, default=150)
    p.add_argument("--render", action="store_true", default=False)
    p.add_argument("--dp", type=int, default=-1)
    return p


def main(argv=None):
    from tcdiff_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # TCDIFF_PLATFORM=cpu keeps a local run off the chip
    opt = build_parser().parse_args(argv)
    cfg = TrajDecoderConfig(
        nfeats=opt.nfeats,
        trans_layer=opt.trans_layer,
        window_size=opt.window_size,
        step=opt.step,
        total_iter=opt.total_iter,
        print_iter=opt.print_iter,
        batch_size=opt.batch_size,
        lr=opt.lr,
        gamma=opt.gamma,
        lr_milestones=tuple(opt.lr_scheduler),
        weight_decay=opt.weight_decay,
        seed=opt.seed,
    )
    from tcdiff_tpu.trajdecoder.trainer import TrajTrainer

    trainer = TrajTrainer(cfg, dancer_num=opt.required_dancer_num, dp=opt.dp)
    if opt.checkpoint:
        from tcdiff_tpu.utils import restore_train_state

        trainer.state, _ = restore_train_state(opt.checkpoint, trainer.state)

    if opt.synthetic:
        from tcdiff_tpu.trajdecoder.dataset import SyntheticTrajDataset

        train_ds = SyntheticTrajDataset(
            opt.synthetic_size, opt.required_dancer_num, opt.seq_len, seed=opt.seed
        )
        test_ds = SyntheticTrajDataset(
            max(2, opt.synthetic_size // 4), opt.required_dancer_num, opt.seq_len,
            seed=opt.seed + 1, normalizer=train_ds.normalizer,
        )
    else:
        from tcdiff_tpu.data.dataset import load_split_file
        from tcdiff_tpu.trajdecoder.dataset import TrajDataset

        split = load_split_file(opt.split_file) if opt.split_file else None
        train_ds = TrajDataset(
            opt.data_path, train=True,
            required_dancer_num=opt.required_dancer_num, split_file=split,
        )
        test_ds = TrajDataset(
            opt.data_path, train=False,
            required_dancer_num=opt.required_dancer_num, split_file=split,
            normalizer=train_ds.normalizer,
        )

    out = f"{opt.out_dir}/{opt.exp_name}"
    trainer.train(train_ds, test_ds, out_dir=out, render=opt.render)
    return trainer


if __name__ == "__main__":
    main()
