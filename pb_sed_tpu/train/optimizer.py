"""Optimizer configuration (padertorch ``Adam`` surface:
``experiments/weak_label_crnn/training.py:264-268`` — ``lr`` +
``gradient_clipping`` + optional ``weight_decay``).

The actual update is an optax chain assembled by the Trainer; the learning
rate is applied as a dynamic scalar inside the jitted step so host-side
annealing/back-off never retraces.
"""
import dataclasses

import optax

from pb_sed_tpu.utils.config import Configurable


@dataclasses.dataclass
class Adam(Configurable):
    lr: float = 1e-3
    gradient_clipping: float = 1e10
    weight_decay: float = 0.
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8

    def make_transform(self):
        """Gradient transform producing *unscaled* update directions; the
        trainer multiplies by -lr (dynamic) when applying."""
        parts = [optax.clip_by_global_norm(self.gradient_clipping),
                 optax.scale_by_adam(
                     b1=self.betas[0], b2=self.betas[1], eps=self.eps)]
        if self.weight_decay:
            parts.append(optax.add_decayed_weights(self.weight_decay))
        return optax.chain(*parts)
