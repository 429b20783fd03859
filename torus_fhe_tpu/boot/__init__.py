from . import api, bootstrap, gates, keyswitch, public_sample
