"""Edge clients: frame sources + the TCP socket sender."""
