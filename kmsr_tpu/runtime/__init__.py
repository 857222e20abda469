from .loader import NativePatchLoader, NativeLoaderUnavailable
