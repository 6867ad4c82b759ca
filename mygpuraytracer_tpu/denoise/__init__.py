from .tza import read_tza, write_tza
from .filter import (Device, DeviceBuffer, Filter, RTFilter,
                     RTLightmapFilter, OidnError)
from .unet import unet_apply, init_unet_params, UNET_ALIGNMENT
