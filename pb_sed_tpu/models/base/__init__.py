from pb_sed_tpu.models.base.model import SoundEventModel
from pb_sed_tpu.models.base.inference import (
    boundaries_detection, inference, filtering, scores_to_dataframes,
    sound_event_detection, tagging)
from pb_sed_tpu.models.base.pseudo_label import pseudo_label
from pb_sed_tpu.models.base.tuning import (
    boundaries_from_events, f_collar, f_tag, psd_auc,
    tune_boundaries_detection, tune_sound_event_detection, tune_tagging,
    update_leaderboard)
