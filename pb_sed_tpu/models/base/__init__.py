from pb_sed_tpu.models.base.model import SoundEventModel
