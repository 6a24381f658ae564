from .samples_generator import *
from .loaders import (load_monks, load_dynamic_monks, load_static_monks,
                      load_got, load_got_edgelists,
                      network_from_edgelist, load_alliances)
from .detection_limit import make_lookup_table, detection_limit_simulation
