from .mini import QueryContext, evaluate, miniparse
