from .torch_import import convert_state_dict, assign_converted
