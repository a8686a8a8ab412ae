"""Drop-in entry point matching the reference's
`python TrajDecoder/train_traj.py`. Thin shim over `tcdiff_tpu.cli.train_traj`.
"""

from tcdiff_tpu.cli.train_traj import main

if __name__ == "__main__":
    main()
