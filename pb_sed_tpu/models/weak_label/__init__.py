from pb_sed_tpu.models.weak_label.crnn import CRNN
