#!/bin/bash
# End-to-end verify: weak_label_crnn training -> tuning -> inference on a
# synthetic DB (the /verify recipe, .claude/skills/verify/SKILL.md).
# Usage: scripts/verify_chain.sh [workdir]
set -e
V=${1:-$(mktemp -d /tmp/verify_pbsed.XXXX)}
cd "$(dirname "$0")/.."
if [ ! -f "$V/db/db.json" ]; then
python - <<EOF
import sys; sys.path.insert(0, 'tests')
from util_synth import build_database
print(build_database("$V/db")[1])
EOF
fi
STORAGE_ROOT=$V/storage DATABASE_JSONS_DIR=$V/db \
exec python -m pb_sed_tpu.experiments.weak_label_crnn.training with \
  device=cpu \
  debug=True batch_size=4 num_iterations=6 checkpoint_interval=3 \
  summary_interval=2 lr_rampup_steps=2 'lr_decay_steps=[]' \
  hyper_params_tuning_batch_size=4 \
  data_provider.json_path=$V/db/db.json \
  data_provider.train_set.train_weak=1 data_provider.train_set.train_strong=1 \
  data_provider.train_set.train_synthetic20=0 data_provider.train_set.train_synthetic21=0 \
  data_provider.train_set.train_unlabel_in_domain=0 \
  data_provider.cached_datasets=None data_provider.min_audio_length=0.2 \
  data_provider.mix_interval=None \
  data_provider.train_fetcher.batch_size=4 data_provider.train_fetcher.prefetch_workers=0 \
  data_provider.train_fetcher.pad_to_multiple=16 \
  data_provider.train_fetcher.min_label_diversity_in_batch=0 \
  data_provider.train_fetcher.min_dataset_examples_in_batch=None \
  data_provider.test_fetcher.batch_size=4 data_provider.test_fetcher.prefetch_workers=0 \
  data_provider.test_fetcher.pad_to_multiple=16 \
  data_provider.train_transform.stft.shift=160 \
  data_provider.train_transform.stft.window_length=480 \
  data_provider.train_transform.stft.size=512 \
  data_provider.train_transform.anchor_sampling_fn=None \
  data_provider.train_transform.anchor_shift_sampling_fn=None \
  trainer.model.feature_extractor.stft_size=512 \
  trainer.model.feature_extractor.stft_shift=160 \
  trainer.model.feature_extractor.stft_window_length=480 \
  trainer.model.feature_extractor.number_of_filters=16 \
  'trainer.model.cnn.cnn_2d.out_channels=[4,4]' \
  'trainer.model.cnn.cnn_2d.pool_size=[[2,1],[2,1]]' \
  trainer.model.cnn.cnn_2d.kernel_size=3 \
  'trainer.model.cnn.cnn_1d.out_channels=[8,8]' \
  trainer.model.cnn.cnn_1d.kernel_size=3 \
  trainer.model.rnn_fwd.rnn.hidden_size=8 trainer.model.rnn_fwd.rnn.num_layers=1 \
  'trainer.model.rnn_fwd.output_net.out_channels=[8,3]' \
  trainer.model.rnn_fwd.output_net.kernel_size=1
