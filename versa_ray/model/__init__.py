from .micro import MicroModel, newmodel
from . import store, vutil
