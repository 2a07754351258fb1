from .revgrad import gradient_reversal
from .polyformer import Polyformer, PolyformerLayer, polyformer_param_labels
