from . import device, noise, serialize
