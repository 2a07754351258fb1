from .attention import (CrossAttFeatTrans, ExpandedFeatTrans,
                        SqueezedAttFeatTrans, LearnedSoftAggregate)
from .poscode import (LearnedSinuPosEmbedder, SlidingPosBiases2D,
                      SlidingPosBiases3D, SegtranPosEncoder)
from .encoder import SegtranFusionEncoder
