from pb_sed_tpu.models import base, strong_label, weak_label
