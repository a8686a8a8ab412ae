from tcdiff_tpu.data.normalizer import Normalizer  # noqa: F401
from tcdiff_tpu.data.synthetic import synthetic_batch, synthetic_dataset  # noqa: F401
