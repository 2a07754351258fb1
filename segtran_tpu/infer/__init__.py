from .sliding import sliding_window_2d, sliding_window_3d, window_grid
from .metrics import dice_score, jaccard_score, batch_dice_per_class
