from fastdiff_tpu.vocoders.base import (BaseVocoder, get_vocoder_cls,
                                        register_vocoder)
from fastdiff_tpu.vocoders import gl  # noqa: F401  (registers GL vocoders)
from fastdiff_tpu.vocoders import fastdiff_vocoder  # noqa: F401
