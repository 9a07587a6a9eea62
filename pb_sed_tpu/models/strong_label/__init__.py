from pb_sed_tpu.models.strong_label.crnn import CRNN
