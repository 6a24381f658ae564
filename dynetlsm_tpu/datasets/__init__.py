from .samples_generator import *
