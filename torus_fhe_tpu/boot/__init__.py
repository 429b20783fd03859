from . import api, bootstrap, gates, keyswitch
