"""gridpp-shaped public API: numpy in/out wrappers over the device ops."""
