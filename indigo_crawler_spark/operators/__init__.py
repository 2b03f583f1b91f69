"""DataFrame operators — the §2 inventory, each a small composable function."""
