from tcdiff_tpu.optim.adan import adan
from tcdiff_tpu.optim.ema import ema_update

__all__ = ["adan", "ema_update"]
