from .st import *  # noqa: F401,F403
