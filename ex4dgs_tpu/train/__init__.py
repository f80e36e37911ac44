"""Training: jitted step, losses, host-side trainer loop."""
