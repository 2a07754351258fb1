from .resize import resize_linear, resize_to, interpolate_channels_last
from .losses import (dice_loss_indiv, dice_loss_mix, smooth_dice_loss,
                     weighted_bce_with_logits, calc_vcdr_batch,
                     calc_vcdr_eval)
