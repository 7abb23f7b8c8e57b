"""Streaming metric accumulation + progress reporting.

The reference keeps batch-size-weighted incremental means of ELBO / recon
loss / KL and paints a ``\r`` progress line to stderr each minibatch
(train_mnist.py:156-168).  On TPU, syncing three scalars per step would
stall the pipeline (SURVEY.md section 7.3.5), so the epoch driver returns
the whole per-batch metric array in one device->host fetch and this module
reduces it with the identical weighted-mean recurrence.
"""

from __future__ import annotations

import numpy as np

PROGRESS_TEMPLATE = ("# [{}/{}] training {:.1%}, ELBO={:.5f}, "
                     "Error={:.5f}, KL={:.5f}")


class StreamingMeans:
    """Batch-size-weighted incremental means of (elbo, gen_loss, kl)."""

    def __init__(self):
        self.count = 0
        self.elbo = 0.0
        self.gen_loss = 0.0
        self.kl = 0.0

    def update(self, batch_size: int, elbo: float, gen_loss: float, kl: float):
        self.count += batch_size
        self.elbo += batch_size * (elbo - self.elbo) / self.count
        self.gen_loss += batch_size * (gen_loss - self.gen_loss) / self.count
        self.kl += batch_size * (kl - self.kl) / self.count

    def update_array(self, metrics: np.ndarray, batch_size: int,
                     tail_metrics=None, tail_size: int = 0):
        """metrics: (num_batches, 3) rows of (elbo, gen_loss, kl)."""
        for row in np.asarray(metrics):
            self.update(batch_size, float(row[0]), float(row[1]), float(row[2]))
        if tail_metrics is not None and tail_size > 0:
            t = np.asarray(tail_metrics)
            self.update(tail_size, float(t[0]), float(t[1]), float(t[2]))

    def progress_line(self, epoch: int, num_epochs: int, n_total: int) -> str:
        return PROGRESS_TEMPLATE.format(epoch + 1, num_epochs,
                                        self.count / n_total, self.elbo,
                                        self.gen_loss, self.kl)

