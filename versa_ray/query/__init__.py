from .full import execute, parse
from .mini import QueryContext, evaluate, miniparse
