"""Drop-in entry point matching the reference's `python train.py` invocation
(`/root/reference/train.py:8-25`). Thin shim over `tcdiff_tpu.cli.train`.
"""

from tcdiff_tpu.cli.train import main

if __name__ == "__main__":
    main()
