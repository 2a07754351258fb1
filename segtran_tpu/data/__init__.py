from .labelmaps import (fundus_map_mask, fundus_inv_map_mask, polyp_map_mask,
                        polyp_inv_map_mask, index_to_onehot, onehot_inv_map,
                        harden_segmap)
