from tcdiff_tpu.cli.args import build_parser, config_from_opt, parse_train_opt

__all__ = ["build_parser", "config_from_opt", "parse_train_opt"]
