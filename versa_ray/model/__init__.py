from .micro import MicroModel, newmodel
from . import vutil
